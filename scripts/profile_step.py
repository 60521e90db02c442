"""Profile one fwd+bwd bench step on TPU and print the op-level breakdown.

Captures a jax.profiler trace around a few warm grad steps, parses the
xplane protobuf directly (the tensorboard-plugin converter is broken in this
image — PERF_NOTES "Measurement pitfalls"), and aggregates device time by
op category so the next optimization target is measured, not guessed:

  * pallas kernels (cull / gated cull / fused walk+sweep) — real work
  * XLA fusions, sorts, scatters, transposes/copies — the "glue"

Usage:  python scripts/profile_step.py [--tile N] [--ct N] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import warnings

sys.path.insert(0, "/root/repo")
warnings.filterwarnings("ignore")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

WIDTH = HEIGHT = 256
RAYS_PER_PIXEL = 2
BOUNCES = 10


def capture(tile=None, ct=None, steps=3, outdir="/tmp/profile_step",
            schedule=False):
    import jax
    import jax.numpy as jnp

    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.render import diff
    from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    overrides = dict(width=WIDTH, height=HEIGHT,
                     rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES)
    if tile:
        overrides["packet_tile"] = tile
    if os.environ.get("SORT_KEY"):
        overrides["sort_key"] = os.environ["SORT_KEY"]
    scene = load_scene(
        "/root/reference/teapot.scene",
        config_overrides=overrides,
        **(dict(cluster_tris=ct) if ct else {}),
    )
    if schedule:
        # The bench configuration: calibrated static live-prefix schedule.
        import dataclasses

        sched = diff.calibrate_live_schedule(
            scene, rays_per_pixel=RAYS_PER_PIXEL, bounces=BOUNCES
        )
        scene = scene.replace(
            config=dataclasses.replace(scene.config, live_schedule=sched)
        )
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
    with jax.profiler.trace(outdir):
        outs = [grad_fn(params, jnp.uint32(i + 2)) for i in range(steps)]
        jax.block_until_ready(outs)
    return outdir, steps


def parse(outdir, steps, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {outdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    # Device plane, "XLA Ops" line only. Events on that line NEST (a cond's
    # event spans its body's ops, async -start events span the transfer), so
    # naive duration sums double-count by ~4x. Aggregate SELF time instead:
    # walk events in start order with a containment stack and subtract each
    # event's contained children — the result sums to the module wall time
    # (verified: 75.3 vs 75.5 ms/step on the round-3 bench trace).
    by_name = collections.Counter()
    calls = collections.Counter()
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            # Sort ties by DESCENDING duration so a parent that shares its
            # start timestamp with its first child precedes it on the
            # containment stack (ascending would push the parent as the
            # child's child and drive its self time negative).
            evs = sorted(
                ((ev.offset_ps, -ev.duration_ps,
                  ev_meta.get(ev.metadata_id, str(ev.metadata_id)))
                 for ev in line.events)
            )
            evs = [(off, -ndur, name) for off, ndur, name in evs]
            stack = []  # (start, end, child_total) of open ancestors
            rows_ = []
            for start, dur, name in evs:
                end = start + dur
                while stack and stack[-1][1] <= start:
                    stack.pop()
                if stack:
                    stack[-1][2][0] += dur
                child = [0]
                stack.append((start, end, child))
                rows_.append((name, dur, child))
            for name, dur, child in rows_:
                self_ps = dur - child[0]
                by_name[name] += self_ps
                calls[name] += 1
                total_ps += self_ps
    rows = by_name.most_common(top)
    out = {
        "total_device_ms_per_step": total_ps / 1e9 / steps,
        "top_ops": [
            {
                "op": n,
                "ms_per_step": round(ps / 1e9 / steps, 3),
                "calls_per_step": calls[n] // steps,
                "pct": round(100 * ps / max(total_ps, 1), 1),
            }
            for n, ps in rows
        ],
    }
    # Category buckets: pallas kernels vs everything else.
    def bucket(name: str) -> str:
        n = name.lower()
        # Pallas kernels only — plain XLA fusions also contain "fused"
        # (calls=%fused_computation.N), so match the kernel names exactly.
        if "fused_closest_hit" in n or "cull_tiles" in n or "sweep_pairs" in n \
                or "tpu_custom_call" in n:
            return "pallas"
        if "sort" in n:
            return "sort"
        if "scatter" in n:
            return "scatter"
        if "fusion" in n:
            return "fusion"
        if "copy" in n or "transpose" in n or "bitcast" in n:
            return "copy"
        if "broadcast" in n or "split" in n or n.startswith("%pad"):
            return "materialize"
        if "dot" in n or "convolution" in n:
            return "dot"
        return "other"

    cats = collections.Counter()
    for n, ps in by_name.items():
        cats[bucket(n)] += ps
    out["categories_ms_per_step"] = {
        k: round(v / 1e9 / steps, 3) for k, v in cats.most_common()
    }
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tile", type=int, default=None)
    parser.add_argument("--ct", type=int, default=None)
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--parse-only", default=None,
                        help="skip capture; parse this trace dir")
    parser.add_argument("--schedule", action="store_true",
                        help="calibrate + apply the static live-prefix "
                             "schedule (the bench configuration)")
    args = parser.parse_args()
    if args.parse_only:
        outdir, steps = args.parse_only, args.steps
    else:
        outdir, steps = capture(args.tile, args.ct, args.steps,
                                schedule=args.schedule)
    out = parse(outdir, steps, args.top)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
