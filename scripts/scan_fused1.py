"""A/B the single-program closest-hit (fused1) against the 3-stage fused
path on TPU: bit-equality first, then bench-shape grad step and full-res
forward timings.

Usage:  python scripts/scan_fused1.py [--fullres]
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
import numpy as np

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import diff, pipeline
from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

WIDTH = HEIGHT = 256
RAYS_PER_PIXEL = 2
BOUNCES = 10
REPEATS = 10


def bench_scene(backend, cluster_tris=None, **extra):
    return load_scene(
        "/root/reference/teapot.scene",
        config_overrides=dict(
            width=WIDTH, height=HEIGHT,
            rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES,
            packet_backend=backend, **extra,
        ),
        **({"cluster_tris": cluster_tris} if cluster_tris else {}),
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
    parser.add_argument("--fullres", action="store_true")
    parser.add_argument(
        "--configs", default="64,256,0",
        help="semicolon list of tile,cluster_tris,cull_hier",
    )
    args = parser.parse_args()
    enable_persistent_cache()

    # configs: (tile, cluster_tris, cull_hier)
    configs = []
    for spec in args.configs.split(";"):
        t, c, g = (int(v) for v in spec.split(","))
        configs.append((t, c, g))

    fb_ref = np.asarray(pipeline.render_framebuffer(bench_scene("auto")))
    for tile, ct, g in configs:
        fb = np.asarray(
            pipeline.render_framebuffer(
                bench_scene("fused1", packet_tile=tile, cull_hier=g,
                            cluster_tris=ct)
            )
        )
        equal = bool((fb_ref == fb).all())
        print(json.dumps({"scan": "fused1_bitequal", "tile": tile, "ct": ct,
                          "hier": g, "equal": equal}), flush=True)
        if not equal:
            print(json.dumps({"scan": "mismatch_frac",
                              "frac": float((fb_ref != fb).mean())}))
            return 1

    t = time_grad_step(bench_scene("auto"))
    print(json.dumps({"scan": "fused1_grad", "backend": "auto",
                      "ms_per_step": round(t * 1e3, 2)}), flush=True)
    for tile, ct, g in configs:
        t = time_grad_step(
            bench_scene("fused1", packet_tile=tile, cull_hier=g,
                        cluster_tris=ct)
        )
        print(json.dumps({"scan": "fused1_grad", "backend": "fused1",
                          "tile": tile, "ct": ct, "hier": g,
                          "ms_per_step": round(t * 1e3, 2)}), flush=True)

    if args.fullres:
        for backend in ("auto", "fused1"):
            s = load_scene(
                "/root/reference/teapot.scene",
                config_overrides=dict(rays_per_pixel=10,
                                      packet_backend=backend),
            )
            _img, seconds = pipeline.render_timed(s)
            _img, seconds = pipeline.render_timed(s)
            print(json.dumps({"scan": "fused1_fullres", "backend": backend,
                              "spp": 10, "seconds": round(seconds, 3)}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
