"""Full-res (1000x1000) forward-render knob scan on TPU.

The round-3 bench-shape default flips (sort_depth 5, packet_skip on)
regressed FULL-RES mesh renders ~25-35% (PERF_NOTES): the 256^2 sorted
131k-ray grad shape over-rewards deep sorting and the skip exactly where
262k-ray full-res blocks (20 rays/pixel primary coherence) do not. This
scan measures the full-res regime directly so defaults can be set per
regime instead of globally.

Usage: python scripts/scan_fullres.py [--scene teapot] [--spp 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import warnings

sys.path.insert(0, "/root/repo")
warnings.filterwarnings("ignore")

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import pipeline
from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", default="teapot")
    parser.add_argument("--spp", type=int, default=10)
    parser.add_argument(
        "--configs",
        # backend,sort_depth,packet_skip,cluster_tris,cull_hier[,sort_engine]
        default=(
            "auto,5,1,256,0;auto,2,1,256,0;auto,5,0,256,0;auto,2,0,256,0;"
            "fused1,5,1,256,16;fused1,2,1,256,16"
        ),
    )
    args = parser.parse_args()
    enable_persistent_cache()

    for spec in args.configs.split(";"):
        parts = spec.split(",")
        backend, depth, skip, ct, hier = parts[:5]
        engine = parts[5] if len(parts) > 5 else "count"
        scene = load_scene(
            f"/root/reference/{args.scene}.scene",
            config_overrides=dict(
                rays_per_pixel=args.spp,
                packet_backend=backend,
                sort_depth=int(depth),
                packet_skip=bool(int(skip)),
                cull_hier=int(hier),
                sort_engine=engine,
            ),
            cluster_tris=int(ct),
        )
        _img, _ = pipeline.render_timed(scene)  # warm (compile)
        _img, seconds = pipeline.render_timed(scene)
        print(
            json.dumps(
                {
                    "scan": "fullres",
                    "scene": args.scene,
                    "spp": args.spp,
                    "backend": backend,
                    "sort_depth": int(depth),
                    "skip": bool(int(skip)),
                    "ct": int(ct),
                    "hier": int(hier),
                    "engine": engine,
                    "seconds": round(seconds, 3),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
