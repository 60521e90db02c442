"""REPORT Table-1-style benchmark: render time per scene at 1/10/100 spp.

Mirrors the reference's measurement scope (trace phase only — BVH build and
image output excluded; raytracing.cu:172,279-281) at the reference's
1000x1000 resolution and 10-bounce limit. Prints a markdown table plus the
reference numbers (REPORT.pdf p.7) for comparison.

Usage: python scripts/bench_scenes.py [scene ...] [--spp 1,10,100]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

REFERENCE = {
    # scene: (cpu 1/10/100, gpu-reorder 1/10/100) seconds, REPORT.pdf Table 1
    "spheres": ((0.1, 0.8, 6.6), (0.2, 0.2, 0.9)),
    "cornell": ((1.7, 17.4, 168.9), (0.3, 0.4, 1.8)),
    "cornell_plus": ((1.7, 17.6, 171.0), (0.2, 0.4, 1.8)),
    "teapot": ((1.1, 11.2, 109.7), (0.2, 0.3, 1.4)),
    "glass_teapot": ((1.6, 16.0, 156.3), (0.2, 0.3, 1.9)),
    "lamp": ((1.9, 18.7, 186.3), (0.2, 0.4, 1.9)),
}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("scenes", nargs="*", default=None)
    parser.add_argument("--spp", default="1,10,100")
    parser.add_argument("--size", type=int, default=1000)
    # Intersector knobs, for A/B-ing candidate default configs on hardware
    # (same dimensions as scripts/scan_skip.py).
    parser.add_argument("--packet-tile", type=int, default=None)
    parser.add_argument("--cluster-tris", type=int, default=None)
    parser.add_argument("--packet-skip", action="store_true")
    parser.add_argument("--cull-split", type=int, default=None)
    parser.add_argument("--cull-hier", type=int, default=None)
    args = parser.parse_args()
    scenes = args.scenes or list(REFERENCE)
    spps = [int(s) for s in args.spp.split(",")]
    knobs = {
        k: v
        for k, v in dict(
            packet_tile=args.packet_tile,
            packet_skip=args.packet_skip or None,
            cull_split=args.cull_split,
            cull_hier=args.cull_hier,
        ).items()
        if v is not None
    }

    import warnings

    warnings.filterwarnings("ignore")

    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.render.pipeline import render_timed
    from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    print(f"| scene | ours {'/'.join(map(str, spps))} spp (s) | ref GPU (s) | ref CPU (s) |")
    print("|---|---|---|---|")
    for name in scenes:
        ours = []
        for spp in spps:
            scene = load_scene(
                f"/root/reference/{name}.scene",
                config_overrides=dict(
                    width=args.size, height=args.size,
                    rays_per_pixel=spp, bounces=10, **knobs,
                ),
                **(
                    dict(cluster_tris=args.cluster_tris)
                    if args.cluster_tris else {}
                ),
            )
            _, secs = render_timed(scene)  # includes first-pass compile
            _, secs = render_timed(scene)  # warm
            ours.append(secs)
        ref_cpu, ref_gpu = REFERENCE.get(name, ((), ()))
        print(
            f"| {name} | "
            + " / ".join(f"{s:.2f}" for s in ours)
            + " | "
            + " / ".join(f"{s:.1f}" for s in ref_gpu)
            + " | "
            + " / ".join(f"{s:.1f}" for s in ref_cpu)
            + " |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
