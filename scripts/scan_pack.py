"""Hardware A/B of cluster_pack (paired sub-cluster intersector) on teapot.

VERDICT r4 task 1's measured A/B: the paired C=64 design (cluster_pack=2,
PERF_NOTES roadmap item 0) vs the shipped C=256 fused1 path, on
  * the full-res forward regime: teapot 1000x1000 x 10 spp (render_timed
    scope - the judge's <= 1.8 s bar), and
  * the bench grad step: 256x256 x 2 spp x 10 bounces fwd+bwd.
Bit-equality is certified separately (tests/test_packet.py pack parity +
the render certificate channel); this script measures time only.

Usage: python scripts/scan_pack.py [--configs 1,2] [--spp 10] [--skip-grad]
         [--ct2 128]  (cluster_tris for the pack=2 table: C_sub = ct2/2)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
warnings.filterwarnings("ignore")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2")
    ap.add_argument("--spp", type=int, default=10)
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--scene", default="teapot")
    ap.add_argument("--ct2", type=int, default=128,
                    help="cluster_tris for pack=2 (C_sub = ct2/2)")
    ap.add_argument("--skip-grad", action="store_true")
    ap.add_argument("--skip-render", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.render import diff
    from cuda_raytracer_tpu.render.pipeline import render_timed
    from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    for pack in [int(c) for c in args.configs.split(",")]:
        overrides = dict(width=args.size, height=args.size,
                         rays_per_pixel=args.spp, bounces=10)
        kwargs = {}
        if pack > 1:
            overrides["cluster_pack"] = pack
            kwargs["cluster_tris"] = args.ct2
        row = {"pack": pack, "scene": args.scene,
               "ct": kwargs.get("cluster_tris", 256)}
        if not args.skip_render:
            scene = load_scene(
                f"/root/reference/{args.scene}.scene",
                config_overrides=overrides, **kwargs,
            )
            from cuda_raytracer_tpu.ops.pallas import fused1 as f1
            # Diagnostic only: shard plan at the RAY_BLOCK tile count the
            # pipeline actually dispatches (the earlier whole-image T here
            # made the field meaningless).
            row["n_shards"] = f1.plan_shards(
                (1 << 18) // scene.config.packet_tile,
                scene.config.packet_tile, scene.cluster_tris,
                scene.num_clusters, pack=pack,
            )
            row["K"] = scene.num_clusters
            render_timed(scene)  # compile + load
            _, secs = render_timed(scene)
            row["render_s"] = round(secs, 3)
        if not args.skip_grad:
            overrides2 = dict(overrides, width=256, height=256,
                              rays_per_pixel=2)
            gscene = load_scene(
                f"/root/reference/{args.scene}.scene",
                config_overrides=overrides2, **kwargs,
            )
            sched = diff.calibrate_live_schedule(
                gscene, rays_per_pixel=2, bounces=10
            )
            import dataclasses
            audited = gscene.replace(config=dataclasses.replace(
                gscene.config, live_schedule=sched))
            if diff.check_radiance_exact(
                audited, rays_per_pixel=2, bounces=10
            ) == 0:
                gscene = audited
            params, _ = diff.split_params(gscene)
            target = jnp.zeros((gscene.num_pixels, 3), jnp.float32)
            grad_fn = jax.jit(jax.value_and_grad(
                lambda p, s: diff.loss_against_target(
                    p, gscene, target, s, 2, 10)))
            jax.block_until_ready(grad_fn(params, jnp.uint32(0)))
            jax.block_until_ready(grad_fn(params, jnp.uint32(1)))
            t0 = time.perf_counter()
            outs = [grad_fn(params, jnp.uint32(i + 2)) for i in range(10)]
            jax.block_until_ready(outs)
            row["grad_step_ms"] = round(
                (time.perf_counter() - t0) / 10 * 1e3, 2)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
