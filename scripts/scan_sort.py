"""Scan Morton-sort depth (bench shape) and RAY_BLOCK (full res) on TPU.

Two independent knobs around the per-bounce Morton reorder:

  * ``sort_depth`` — how many early bounces get a live-first reorder.
    Each sort costs an XLA bitonic argsort (~3 ms at R=131k) but buys
    tile coherence for the packet sweep AND tightens the live-prefix
    compaction bound. The default (4) was tuned before the sort
    permutation became a saved checkpoint residual ("sort_order"), which
    halved the effective per-sort cost — deeper sorting may now win.

  * ``RAY_BLOCK`` — rays per full-res sub-pass block
    (render/pipeline.py). Each block is globally sorted (compaction on);
    smaller blocks sort cheaper (O(cs log^2 cs)) and compact at finer
    granularity, but repeat per-block fixed costs (cull table setup,
    kernel launches).

Usage:  python scripts/scan_sort.py [--depths 0,2,4,6,10] [--fullres]
"""

from __future__ import annotations

import argparse
import json
import time
import sys
import warnings

sys.path.insert(0, "/root/repo")  # run from anywhere
warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import diff, pipeline
from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

WIDTH = HEIGHT = 256
RAYS_PER_PIXEL = 2
BOUNCES = 10
REPEATS = 10


def time_grad_step(scene, params, target):
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


def scan_depths(depths, engines=("argsort",)):
    """``depth`` -1 means sorting off entirely; 0 means sort every bounce
    (RenderConfig.sort_depth falsy-0 semantics, wavefront.py). ``engines``
    A/Bs the reorder implementation (argsort vs the matmul counting sort,
    ops/sort.py) at each depth."""
    results = []
    for depth in depths:
        for engine in (engines if depth >= 0 else engines[:1]):
            scene = load_scene(
                "/root/reference/teapot.scene",
                config_overrides=dict(
                    width=WIDTH, height=HEIGHT,
                    rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES,
                    sort_rays=depth >= 0, sort_depth=max(depth, 0),
                    sort_engine=engine,
                ),
            )
            params, _ = diff.split_params(scene)
            target = jnp.zeros((scene.num_pixels, 3), jnp.float32)
            t = time_grad_step(scene, params, target)
            row = {"scan": "sort_depth", "sort_depth": depth,
                   "engine": engine, "ms_per_step": round(t * 1e3, 2)}
            print(json.dumps(row), flush=True)
            results.append(row)
    return results


def scan_ray_block(blocks, spp=10):
    """Forward-only full-res teapot render per RAY_BLOCK (Table-1 scope)."""
    results = []
    default = pipeline.RAY_BLOCK
    try:
        for rb in blocks:
            pipeline.RAY_BLOCK = rb
            scene = load_scene("/root/reference/teapot.scene",
                               config_overrides=dict(rays_per_pixel=spp))
            _img, seconds = pipeline.render_timed(scene)  # compile+warm
            _img, seconds = pipeline.render_timed(scene)
            row = {"scan": "ray_block", "ray_block": rb, "spp": spp,
                   "seconds": round(seconds, 3)}
            print(json.dumps(row), flush=True)
            results.append(row)
    finally:
        pipeline.RAY_BLOCK = default
    return results


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--depths", default="-1,2,3,4,5,6,0",
                        help="-1 = sorting off; 0 = sort every bounce")
    parser.add_argument("--fullres", action="store_true",
                        help="also scan RAY_BLOCK at 1000x1000x10spp "
                             "(several full-res compiles; slow cold)")
    parser.add_argument("--engines", default="argsort",
                        help="comma list of sort engines to A/B "
                             "(argsort,count)")
    args = parser.parse_args()
    enable_persistent_cache()

    results = scan_depths(
        [int(d) for d in args.depths.split(",") if d != ""],
        engines=tuple(args.engines.split(",")),
    )
    if args.fullres:
        results += scan_ray_block([1 << 16, 1 << 17, 1 << 18])

    depth_rows = [r for r in results if r["scan"] == "sort_depth"]
    if depth_rows:
        best = min(depth_rows, key=lambda r: r["ms_per_step"])
        print(json.dumps({"best_depth": best, "backend": jax.default_backend()}))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
