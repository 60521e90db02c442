"""Whole-pass bounce megakernel (ops/pallas/shade.py) parity tests.

The megakernel mirrors the wavefront path expression-for-expression (camera
gen, sphere/triangle closest hit with first-min ties, scene.cu:320-487
shading, the PCG chain); in interpret mode both execute the same jnp ops, so
per-ray radiance must be BIT-identical. That is the whole acceptance: any
divergence is a transcription bug, not tolerance noise.
"""

import dataclasses
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops.pallas import shade
from cuda_raytracer_tpu.render import wavefront

REF = "/root/reference"


def _wavefront_collected(scene, rpp, bounces, pass_seed=0):
    total = scene.config.width * scene.config.height * rpp
    ray_id = jnp.arange(total, dtype=jnp.int32)
    state = wavefront.make_initial_state(scene, ray_id, rpp, pass_seed)
    state, suspect = wavefront.trace_wavefront(
        scene, state, pass_seed, bounces, sort_rays=False
    )
    assert int(suspect) == 0
    return np.asarray(state.collected)


@pytest.mark.parametrize("scene_name", ["spheres", "cornell", "cornell_plus"])
def test_megakernel_bitwise_matches_wavefront(scene_name):
    scene = load_scene(
        f"{REF}/{scene_name}.scene",
        config_overrides=dict(width=16, height=16),
        prefer_native_bvh=False,
    )
    assert shade.megakernel_eligible(
        scene.replace(
            config=dataclasses.replace(scene.config, shade_engine="megakernel")
        )
    )
    rpp, bounces, seed = 2, 4, 7
    ref = _wavefront_collected(scene, rpp, bounces, seed)
    ray_id = jnp.arange(16 * 16 * rpp, dtype=jnp.int32)
    got = np.asarray(
        shade.shade_trace(
            scene, ray_id, rpp, jnp.uint32(seed), bounces, interpret=True
        )
    )
    np.testing.assert_array_equal(ref, got)


def test_megakernel_block_offset_and_padding():
    """Non-zero block_lo (pipeline sub-blocks) and a ray count that forces
    padding lanes must reproduce the wavefront rays exactly."""
    scene = load_scene(
        f"{REF}/spheres.scene",
        config_overrides=dict(width=16, height=16),
        prefer_native_bvh=False,
    )
    rpp, bounces, seed = 2, 3, 1
    ref = _wavefront_collected(scene, rpp, bounces, seed)
    lo, n = 100, 260  # unaligned slice in the middle of the wavefront
    ray_id = lo + jnp.arange(n, dtype=jnp.int32)
    got = np.asarray(
        shade.shade_trace(
            scene, ray_id, rpp, jnp.uint32(seed), bounces, interpret=True
        )
    )
    np.testing.assert_array_equal(ref[lo:lo + n], got)


def test_megakernel_render_pipeline_integration():
    """render_framebuffer with shade_engine='megakernel' must equal the
    default wavefront render bit-for-bit (multi-pass, sub-blocks)."""
    from cuda_raytracer_tpu.render.pipeline import render_framebuffer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        base = load_scene(
            f"{REF}/cornell.scene",
            config_overrides=dict(width=8, height=8, rays_per_pixel=5,
                                  bounces=3, max_rays_per_pixel_per_pass=2),
            prefer_native_bvh=False,
        )
    fb_ref = np.asarray(render_framebuffer(base))
    mk = base.replace(
        config=dataclasses.replace(base.config, shade_engine="megakernel")
    )
    fb_mk = np.asarray(render_framebuffer(mk))
    np.testing.assert_array_equal(fb_ref, fb_mk)


def test_megakernel_ineligible_paths():
    """Mesh scenes (packet path), textured skies and reparam renders must
    fall back to the wavefront path."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        teapot = load_scene(
            f"{REF}/teapot.scene", config_overrides=dict(width=8, height=8)
        )
    assert not shade.megakernel_eligible(
        teapot.replace(
            config=dataclasses.replace(teapot.config, shade_engine="megakernel")
        )
    )
    spheres = load_scene(
        f"{REF}/spheres.scene", config_overrides=dict(width=8, height=8),
        prefer_native_bvh=False,
    )
    mk = spheres.replace(
        config=dataclasses.replace(spheres.config, shade_engine="megakernel")
    )
    assert not shade.megakernel_eligible(mk, reparam=True)
    assert not shade.megakernel_eligible(
        spheres.replace(
            config=dataclasses.replace(spheres.config, shade_engine="xla")
        )
    )
