"""A/B the live-prefix machinery on the bench grad step (TPU).

Variants:
  switch    — dynamic lax.switch over prefix sizes (round-2/3 shipping path)
  schedule  — static per-bounce prefixes from diff.calibrate_live_schedule
              (no conditionals; certificate-guarded)
  none      — no compaction at all (every bounce processes the full
              wavefront; isolates what compaction is worth)

Usage: python scripts/scan_schedule.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import diff
from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

WIDTH = HEIGHT = 256
RPP = 2
BOUNCES = 10
REPEATS = 10


def time_grad_step(scene):
    params, _ = diff.split_params(scene)
    target = jnp.zeros((scene.num_pixels, 3), jnp.float32)
    grad_fn = jax.jit(
        jax.value_and_grad(
            lambda p, seed: diff.loss_against_target(
                p, scene, target, seed, RPP, BOUNCES
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
    enable_persistent_cache()
    base = load_scene(
        "/root/reference/teapot.scene",
        config_overrides=dict(width=WIDTH, height=HEIGHT,
                              rays_per_pixel=RPP, bounces=BOUNCES),
    )
    sched = diff.calibrate_live_schedule(
        base, rays_per_pixel=RPP, bounces=BOUNCES
    )
    print(json.dumps({"scan": "schedule_calibrated",
                      "divisors": list(sched)}), flush=True)
    variants = {
        "switch": base,
        "schedule": base.replace(
            config=dataclasses.replace(base.config, live_schedule=sched)
        ),
        "none": base.replace(
            config=dataclasses.replace(
                base.config, live_schedule=(1,) * BOUNCES
            )
        ),
    }
    for name, scene in variants.items():
        # Exactness audit at this shape (one pass, certificate count).
        suspects = diff.check_radiance_exact(scene, rays_per_pixel=RPP,
                                             bounces=BOUNCES)
        t = time_grad_step(scene)
        print(json.dumps({"scan": "schedule_grad", "variant": name,
                          "suspects": suspects,
                          "ms_per_step": round(t * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
