"""Measure the fused kernel's slab-entry early-out (packet_skip) and the
two-level cull (cull_split) on TPU.

Compares fwd+bwd step time (bench shape) and forward full-res render time
across packet_skip x cull_split combos. Simulation says ~39% of MT tests
are skippable on teapot at C=256 with the group-frozen best; the split
cull prunes block sweeps whose union box slab-hit but no tight chunk box
does. Bit-equality is re-checked on hardware before timing.

Usage:  python scripts/scan_skip.py [--fullres]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")  # run from anywhere
warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import diff, pipeline
from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

WIDTH = HEIGHT = 256
RAYS_PER_PIXEL = 2
BOUNCES = 10
REPEATS = 10


def with_skip(scene, skip):
    return scene.replace(
        config=dataclasses.replace(scene.config, packet_skip=skip)
    )


def time_grad_step(scene):
    params, _ = diff.split_params(scene)
    target = jnp.zeros((scene.num_pixels, 3), jnp.float32)
    grad_fn = jax.jit(
        jax.value_and_grad(
            lambda p, seed: diff.loss_against_target(
                p, scene, target, seed, RAYS_PER_PIXEL, BOUNCES
            )
        )
    )
    jax.block_until_ready(grad_fn(params, jnp.uint32(0)))
    jax.block_until_ready(grad_fn(params, jnp.uint32(1)))
    start = time.perf_counter()
    outs = [grad_fn(params, jnp.uint32(i + 2)) for i in range(REPEATS)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - start) / REPEATS


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fullres", action="store_true",
                        help="also time 1000x1000x10spp teapot forward")
    args = parser.parse_args()
    enable_persistent_cache()

    def bench_scene(split):
        return load_scene(
            "/root/reference/teapot.scene",
            config_overrides=dict(
                width=WIDTH, height=HEIGHT,
                rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES,
                cull_split=split,
            ),
        )

    # Bit-equality on hardware first — a perf number for a wrong kernel is
    # worse than no number.
    fb_ref = np.asarray(pipeline.render_framebuffer(bench_scene(1)))
    for split, skip in ((1, True), (4, False), (4, True)):
        fb = np.asarray(
            pipeline.render_framebuffer(with_skip(bench_scene(split), skip))
        )
        equal = bool((fb_ref == fb).all())
        print(json.dumps({"scan": "bitequal", "cull_split": split,
                          "packet_skip": skip, "equal": equal}), flush=True)
        if not equal:
            print(json.dumps({"scan": "mismatch_frac",
                              "frac": float((fb_ref != fb).mean())}))
            return 1

    for split in (1, 2, 4):
        for skip in (False, True):
            t = time_grad_step(with_skip(bench_scene(split), skip))
            print(json.dumps({"scan": "grad_step", "cull_split": split,
                              "packet_skip": skip,
                              "ms_per_step": round(t * 1e3, 2)}), flush=True)

    if args.fullres:
        for split, skip in ((1, False), (1, True), (4, False), (4, True)):
            s = load_scene("/root/reference/teapot.scene",
                           config_overrides=dict(rays_per_pixel=10,
                                                 packet_skip=skip,
                                                 cull_split=split))
            _img, seconds = pipeline.render_timed(s)  # compile+warm
            _img, seconds = pipeline.render_timed(s)
            print(json.dumps({"scan": "fullres_fwd", "cull_split": split,
                              "packet_skip": skip,
                              "spp": 10, "seconds": round(seconds, 3)}),
                  flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
