"""A/B the per-bounce gradient rematerialisation on TPU (bench shape).

trace_wavefront wraps each bounce in ``jax.checkpoint`` so backward
rematerialises the shading chain from ~5 saved bytes/ray/bounce. That
trades HBM for recompute — but the bench profile (PROFILE_r03) shows the
recompute side is real money: ~20 XLA fusions per bounce re-run in
backward, while the avoided residuals are only a few (R, 3) arrays per
bounce (~70 MB at the bench shape, far under the v5e's 16 GB). This scan
measures the grad step and its peak-memory cost with checkpointing on and
off to decide the default.

Usage:  python scripts/scan_remat.py [--width N] [--rpp N] [--bounces N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import diff, wavefront
from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

REPEATS = 10


def time_grad_step(scene, rpp, bounces, checkpoint_bounces):
    params, _ = diff.split_params(scene)
    target = jnp.zeros((scene.num_pixels, 3), jnp.float32)

    def loss(p, seed):
        sc = diff.merge_params(scene, p)
        ray_id = jnp.arange(sc.num_pixels * rpp, dtype=jnp.int32)
        state = wavefront.make_initial_state(sc, ray_id, rpp, seed)
        state, _ = wavefront.trace_wavefront(
            sc, state, seed, bounces, sc.config.sort_rays,
            checkpoint_bounces=checkpoint_bounces,
        )
        acc = wavefront.accumulate_radiance(
            state, rpp, sc.num_pixels,
            ordered=wavefront.wavefront_ordered(sc, sc.config.sort_rays, bounces),
        )
        rendered = acc / rpp
        return jnp.mean((rendered - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    compiled = grad_fn.lower(params, jnp.uint32(0)).compile()
    mem = compiled.memory_analysis()
    peak = getattr(mem, "temp_size_in_bytes", None)
    jax.block_until_ready(grad_fn(params, jnp.uint32(0)))
    jax.block_until_ready(grad_fn(params, jnp.uint32(1)))
    start = time.perf_counter()
    outs = [grad_fn(params, jnp.uint32(i + 2)) for i in range(REPEATS)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - start) / REPEATS, peak


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--rpp", type=int, default=2)
    parser.add_argument("--bounces", type=int, default=10)
    args = parser.parse_args()
    enable_persistent_cache()

    scene = load_scene(
        "/root/reference/teapot.scene",
        config_overrides=dict(
            width=args.width, height=args.width,
            rays_per_pixel=args.rpp, bounces=args.bounces,
        ),
    )
    for ckpt in (True, False):
        t, peak = time_grad_step(scene, args.rpp, args.bounces, ckpt)
        print(json.dumps({
            "scan": "remat", "checkpoint_bounces": ckpt,
            "ms_per_step": round(t * 1e3, 2),
            "temp_bytes": peak,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
