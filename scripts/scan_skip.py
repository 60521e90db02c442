"""Measure the fused kernel's per-ray slab-entry early-out (packet_skip)
across (packet_tile, cluster_tris) configs on TPU.

Per scripts/lever_sim.py (teapot, b1-sorted MT tests/ray):

  C=256 t=64: 5376 -> 4096 masked | C=256 t=32: 3264 -> 2496
  C=128 t=64: 3520 -> 2560        | C=128 t=32: 1984 -> 1472
  C=128 t=16: 1200 ->  896

The cull's vector cost is ~K x 10 ops/ray (7.5k at C=256, 15k at C=128)
vs MT's ~50/test, so smaller C + mask should win on op counts; what the
sim can't see is per-pair cursor/staging overheads and narrow-shape
latency at small tiles — that's what this scan measures. Bit-equality is
re-checked on hardware before timing.

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

# (packet_tile, cluster_tris, packet_skip, cull_split, cull_hier); the
# shipped round-2 config (64, 256, False, 1, 0) is the bit-equality
# reference. cull_split=2 at C=128 is the "paired C=64 clusters" design
# from PERF_NOTES roadmap 0: cull granularity 64 tris (tight sub-boxes,
# OR-reduced per block), sweep granularity 128 (lane-aligned).
# cull_hier=G adds the super-AABB pre-pass that gates 128-box chunks of
# the main cull (sim: 4-9x fewer cull ops at C=128/S=2, see
# packet_intersect's hier comment) — it only engages when K*S >= 256,
# i.e. the small-C configs where cull cost grows.
CONFIGS = [
    (64, 256, False, 1, 0),
    (64, 256, True, 1, 0),
    (32, 256, True, 1, 0),
    (64, 128, True, 1, 0),
    (32, 128, True, 1, 0),
    (16, 128, True, 1, 0),
    (32, 128, False, 1, 0),
    (32, 128, True, 2, 0),
    (64, 128, True, 2, 0),
    (32, 256, True, 4, 0),
    (32, 128, True, 2, 16),
    (32, 128, True, 2, 8),
    (64, 128, True, 2, 16),
    (32, 128, True, 4, 8),
]


def bench_scene(tile, ct, skip, split=1, hier=0):
    return load_scene(
        "/root/reference/teapot.scene",
        config_overrides=dict(
            width=WIDTH, height=HEIGHT,
            rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES,
            packet_tile=tile, packet_skip=skip, cull_split=split,
            cull_hier=hier,
        ),
        cluster_tris=ct,
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
    parser.add_argument("--configs", type=str, default=None,
                        help="comma list tile:ct:skip[:split[:hier]], "
                             "e.g. 64:256:1,32:128:1:2:16")
    args = parser.parse_args()
    enable_persistent_cache()

    configs = CONFIGS
    if args.configs:
        configs = [
            (int(f[0]), int(f[1]), bool(int(f[2])),
             int(f[3]) if len(f) > 3 else 1,
             int(f[4]) if len(f) > 4 else 0)
            for f in (x.split(":") for x in args.configs.split(","))
        ]

    # Bit-equality on hardware first — a perf number for a wrong kernel is
    # worse than no number. NOTE: changing tile/ct changes float reduction
    # ORDER nowhere (MT math is per-pair identical and the accumulate is an
    # exact min-fold), so all configs must agree bit-for-bit.
    fb_ref = np.asarray(pipeline.render_framebuffer(bench_scene(64, 256, False)))
    for tile, ct, skip, split, hier in configs[1:]:
        fb = np.asarray(
            pipeline.render_framebuffer(bench_scene(tile, ct, skip, split, hier))
        )
        equal = bool((fb_ref == fb).all())
        print(json.dumps({"scan": "bitequal", "tile": tile, "ct": ct,
                          "packet_skip": skip, "cull_split": split,
                          "cull_hier": hier, "equal": equal}), flush=True)
        if not equal:
            print(json.dumps({"scan": "mismatch_frac",
                              "frac": float((fb_ref != fb).mean())}))
            return 1

    for tile, ct, skip, split, hier in configs:
        t = time_grad_step(bench_scene(tile, ct, skip, split, hier))
        print(json.dumps({"scan": "grad_step", "tile": tile, "ct": ct,
                          "packet_skip": skip, "cull_split": split,
                          "cull_hier": hier,
                          "ms_per_step": round(t * 1e3, 2)}), flush=True)

    if args.fullres:
        for tile, ct, skip, split, hier in configs:
            s = load_scene(
                "/root/reference/teapot.scene",
                config_overrides=dict(rays_per_pixel=10, packet_tile=tile,
                                      packet_skip=skip, cull_split=split,
                                      cull_hier=hier),
                cluster_tris=ct,
            )
            _img, seconds = pipeline.render_timed(s)  # compile+warm
            _img, seconds = pipeline.render_timed(s)
            print(json.dumps({"scan": "fullres_fwd", "tile": tile, "ct": ct,
                              "packet_skip": skip, "cull_split": split,
                              "cull_hier": hier,
                              "spp": 10, "seconds": round(seconds, 3)}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
