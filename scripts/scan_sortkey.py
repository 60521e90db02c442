"""A/B the wavefront sort key (morton vs cullhit first2) on TPU hardware.

The cullhit key (ops/morton.first2_cluster_keys) sorts rays by their first
two slab-hit cluster indices — simulation (scripts/cullsort_sim.py) says it
cuts swept MT tests/ray 2.37x on the teapot b1 wavefront, matching the
full-signature upper bound, at the price of one extra (R, K) slab pass per
sorted bounce. This scan prices both sides on the chip:

  * bench-shape grad step (teapot 256x256x2spp x10, the bench.py shape)
  * full-res forward renders (1000x1000 @ 10 spp, render_timed scope)

Usage: python scripts/scan_sortkey.py [--fullres] [--scenes teapot,lamp]
"""

from __future__ import annotations

import argparse
import json
import time
import sys
import warnings

sys.path.insert(0, "/root/repo")
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


def with_schedule(scene):
    """Apply the calibrated static live-prefix schedule (the bench.py /
    make_train_step configuration) so the scan prices the key in the
    shipped training regime, not the dynamic-switch one."""
    import dataclasses

    sched = diff.calibrate_live_schedule(
        scene, rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES
    )
    audited = scene.replace(
        config=dataclasses.replace(scene.config, live_schedule=sched)
    )
    if diff.check_radiance_exact(
        audited, rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES
    ) == 0:
        return audited
    return scene


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


def scan_bench(keys, schedule=False):
    results = []
    for key in keys:
        scene = load_scene(
            "/root/reference/teapot.scene",
            config_overrides=dict(
                width=WIDTH, height=HEIGHT,
                rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES,
                sort_key=key,
            ),
        )
        if schedule:
            scene = with_schedule(scene)
        params, _ = diff.split_params(scene)
        target = jnp.zeros((scene.num_pixels, 3), jnp.float32)
        t = time_grad_step(scene, params, target)
        row = {"scan": "sort_key_bench", "sort_key": key,
               "scheduled": bool(schedule),
               "ms_per_step": round(t * 1e3, 2)}
        print(json.dumps(row), flush=True)
        results.append(row)
    return results


def scan_fullres(keys, scenes, spp=10):
    results = []
    for name in scenes:
        for key in keys:
            scene = load_scene(
                f"/root/reference/{name}.scene",
                config_overrides=dict(rays_per_pixel=spp, sort_key=key),
            )
            _img, _ = pipeline.render_timed(scene)  # compile + warm
            _img, seconds = pipeline.render_timed(scene)
            row = {"scan": "sort_key_fullres", "scene": name, "spp": spp,
                   "sort_key": key, "seconds": round(seconds, 3)}
            print(json.dumps(row), flush=True)
            results.append(row)
    return results


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--keys", default="morton,cullhit")
    parser.add_argument("--fullres", action="store_true")
    parser.add_argument("--scenes", default="teapot")
    parser.add_argument("--no-bench", action="store_true")
    parser.add_argument("--schedule", action="store_true",
                        help="measure the calibrated static live-prefix "
                             "schedule configuration (the shipped bench.py "
                             "regime) instead of the dynamic switch")
    args = parser.parse_args()
    enable_persistent_cache()
    keys = tuple(args.keys.split(","))
    if not args.no_bench:
        scan_bench(keys, schedule=args.schedule)
    if args.fullres:
        scan_fullres(keys, args.scenes.split(","))
    print(json.dumps({"backend": jax.default_backend()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
