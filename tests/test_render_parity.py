"""Matched-seed parity of the JAX wavefront renderer vs the scalar oracle.

This is the framework's version of the reference's dual-backend cross-check
(SURVEY §4.1) made *stronger*: instead of comparing statistics between two
independently-seeded backends, both implementations consume identical PCG
streams, so every ray's radiance must agree to float32 tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import wavefront
from cuda_raytracer_tpu.render.pipeline import render_framebuffer

import oracle

REF = "/root/reference"


def _collected(scene, rpp, bounces, pass_seed=0, sort_rays=False):
    total = scene.config.width * scene.config.height * rpp
    ray_id = jnp.arange(total, dtype=jnp.int32)
    state = wavefront.make_initial_state(scene, ray_id, rpp, pass_seed)
    state, suspect = wavefront.trace_wavefront(scene, state, pass_seed, bounces, sort_rays)
    assert int(suspect) == 0
    order = np.argsort(np.asarray(state.ray_id))
    return np.asarray(state.collected)[order]


@pytest.mark.parametrize("scene_name", ["cornell", "spheres", "cornell_plus"])
def test_collected_matches_oracle(scene_name):
    scene = load_scene(
        f"{REF}/{scene_name}.scene",
        config_overrides=dict(width=6, height=6),
        prefer_native_bvh=False,
    )
    bounces = 4
    ours = _collected(scene, rpp=2, bounces=bounces)
    ref = oracle.render_oracle(scene, rays_per_pixel=2, bounces=bounces)
    # Emission values reach 40; tolerate float32 accumulation noise. A tiny
    # fraction of rays may diverge discretely when a float32-vs-float64
    # comparison (branch decision, closest-hit tie) flips — require 97%
    # near-exact agreement and sane magnitudes everywhere.
    diff = np.abs(ours - ref).max(axis=1)
    agree = (diff < 1e-3).mean()
    assert agree > 0.97, f"{scene_name}: only {agree:.1%} rays match oracle"


@pytest.mark.parametrize("scene_name", ["cornell", "spheres", "cornell_plus"])
def test_collected_matches_float32_oracle(scene_name):
    """Precision-matched parity: the same scalar oracle forced to float32
    arithmetic. This settles the 97% float64 threshold above — once the
    oracle rounds at the renderer's width, branch decisions (closest-hit
    ties, Schlick coin, TIR test) are taken on near-identical values and
    agreement must be near-total. Any residual divergence is an
    order-of-operations flip at a genuine discrete boundary, not a bug."""
    scene = load_scene(
        f"{REF}/{scene_name}.scene",
        config_overrides=dict(width=6, height=6),
        prefer_native_bvh=False,
    )
    bounces = 4
    ours = _collected(scene, rpp=2, bounces=bounces)
    ref = oracle.render_oracle(scene, rays_per_pixel=2, bounces=bounces,
                               dtype=np.float32)
    diff = np.abs(ours - ref).max(axis=1)
    agree = (diff < 1e-3).mean()
    assert agree >= 0.999, (
        f"{scene_name}: only {agree:.2%} rays match the float32 oracle "
        f"(worst diff {diff.max():.3g})"
    )


def test_sort_vs_no_sort_identical():
    # Morton reordering only permutes execution order; with stable ray ids the
    # per-ray radiance is identical (stronger than the reference, whose GPU
    # seeds by sorted position — see render/wavefront.py docstring).
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(width=6, height=6),
        prefer_native_bvh=False,
    )
    a = _collected(scene, rpp=2, bounces=4, sort_rays=False)
    b = _collected(scene, rpp=2, bounces=4, sort_rays=True)
    np.testing.assert_array_equal(a, b)


def test_sort_vs_no_sort_identical_mesh_scene():
    """Same as above but on a mesh scene that takes the packet-intersector
    path, where sorting also enables live-prefix compaction
    (wavefront.bounce_on_live_prefix): reordering + prefix processing must
    leave per-ray radiance bit-identical — dead rays are no-ops, so skipping
    the dead suffix can change nothing."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene = load_scene(
            f"{REF}/teapot.scene",
            # packet_cap = K: at this toy resolution a tile spans several
            # image rows, so per-tile cluster unions blow past the default
            # XLA-path budget; an uncapped budget keeps the certificate
            # clean (the TPU fused path needs no cap at all).
            config_overrides=dict(width=12, height=12, packet_cap=1 << 14),
        )
    assert wavefront.resolved_intersector(scene) == "packet"
    a = _collected(scene, rpp=2, bounces=5, sort_rays=False)
    b = _collected(scene, rpp=2, bounces=5, sort_rays=True)
    np.testing.assert_array_equal(a, b)


def test_live_schedule_identical_and_certified():
    """A static live-prefix schedule (config.live_schedule) must be
    invisible in results when it covers the live bounds — and a schedule
    that is too tight must trip the certificate and auto-retry back to the
    dynamic switch, never ship a wrong image."""
    import dataclasses
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene = load_scene(
            f"{REF}/teapot.scene",
            config_overrides=dict(width=12, height=12, packet_cap=1 << 14,
                                  rays_per_pixel=4, bounces=5),
        )
    fb_ref = np.asarray(render_framebuffer(scene))

    from cuda_raytracer_tpu.render import diff

    sched = diff.calibrate_live_schedule(scene)
    assert sched[0] == 1  # bounce 0 is always fully live
    scheduled = scene.replace(
        config=dataclasses.replace(scene.config, live_schedule=sched)
    )
    fb_s = np.asarray(render_framebuffer(scheduled))
    np.testing.assert_array_equal(fb_ref, fb_s)

    # A schedule that prunes live rays must fail loudly / retry, not
    # corrupt: divisor 1024 at bounce 1 cannot cover teapot's ~80% live
    # fraction.
    bad = scene.replace(
        config=dataclasses.replace(scene.config, live_schedule=(1, 1024))
    )
    with pytest.raises(RuntimeError, match="exactness certificate"):
        render_framebuffer(bad, auto_retry=False)
    with pytest.warns(UserWarning, match="live_schedule"):
        fb_bad = np.asarray(render_framebuffer(bad))
    np.testing.assert_array_equal(fb_ref, fb_bad)


def test_bvh_vs_no_bvh_identical_image():
    # The reference's own A/B harness (no_bvh flag): identical renders
    # (scene.cu:820, SURVEY §4.3).
    overrides = dict(width=6, height=6, rays_per_pixel=2, bounces=4)
    with_bvh = load_scene(
        f"{REF}/cornell.scene", use_bvh=True,
        config_overrides=overrides, prefer_native_bvh=False,
    )
    without = load_scene(
        f"{REF}/cornell.scene", use_bvh=False,
        config_overrides=overrides, prefer_native_bvh=False,
    )
    fb_a = np.asarray(render_framebuffer(with_bvh))
    fb_b = np.asarray(render_framebuffer(without))
    # Triangle order differs (BVH permutes), so float tie-breaks may differ;
    # radiance must still agree.
    np.testing.assert_allclose(fb_a, fb_b, rtol=1e-4, atol=1e-4)


def test_multi_pass_accumulation():
    # rays_per_pixel > max per pass exercises the pass loop; the framebuffer
    # must equal the sum of the passes' wavefronts.
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(
            width=4, height=4, rays_per_pixel=5, bounces=2,
            max_rays_per_pixel_per_pass=2,
        ),
        prefer_native_bvh=False,
    )
    fb = np.asarray(render_framebuffer(scene))
    assert fb.shape == (16, 3)
    assert np.isfinite(fb).all()
    # 3 passes (2+2+1) with distinct seeds: manually accumulate.
    manual = np.zeros((16, 3))
    remaining = 5
    while remaining:
        chunk = min(remaining, 2)
        remaining -= chunk
        collected = _collected_pass(scene, chunk, remaining)
        manual += collected.reshape(16, chunk, 3).sum(axis=1)
    np.testing.assert_allclose(fb, manual, rtol=1e-5, atol=1e-5)


def _collected_pass(scene, rpp, pass_seed):
    total = scene.config.width * scene.config.height * rpp
    ray_id = jnp.arange(total, dtype=jnp.int32)
    state = wavefront.make_initial_state(scene, ray_id, rpp, pass_seed)
    state, _ = wavefront.trace_wavefront(
        scene, state, pass_seed, scene.config.bounces, scene.config.sort_rays
    )
    order = np.argsort(np.asarray(state.ray_id))
    return np.asarray(state.collected)[order]


def test_unknown_intersector_fails_fast():
    """A typo'd (or removed, e.g. round 1's 'clustered') intersector mode
    must raise, not silently fall through to a different engine."""
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(
            width=4, height=4, rays_per_pixel=1, bounces=1,
            intersector="clustered",
        ),
    )
    with pytest.raises(ValueError, match="unknown intersector"):
        wavefront.resolved_intersector(scene)


def test_cullhit_sort_key_identical():
    """sort_key="cullhit" (first2 cluster keys) only changes execution
    order: per-ray radiance must be bit-identical to the Morton key — the
    same invariance the sort/no-sort pair establishes, for the new key."""
    import dataclasses
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene = load_scene(
            f"{REF}/teapot.scene",
            config_overrides=dict(width=12, height=12, packet_cap=1 << 14),
        )
    assert wavefront.resolved_intersector(scene) == "packet"
    a = _collected(scene, rpp=2, bounces=5, sort_rays=True)
    scene_ch = dataclasses.replace(
        scene, config=dataclasses.replace(scene.config, sort_key="cullhit")
    )
    b = _collected(scene_ch, rpp=2, bounces=5, sort_rays=True)
    np.testing.assert_array_equal(a, b)
