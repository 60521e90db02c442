"""Full-res bit-equality + timing A/B: 3-stage fused vs fused1 (TPU).

Certifies that the per-regime auto backend flip (pipeline._regime_scene)
cannot change any output bit at production shapes — including the sharded
table path (lamp's ~28 MB block table splits across fused1 shards).

Usage: python scripts/ab_fullres.py [--scenes teapot,lamp] [--spp 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import warnings

sys.path.insert(0, "/root/repo")
warnings.filterwarnings("ignore")

import numpy as np

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import pipeline
from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenes", default="teapot,lamp")
    parser.add_argument("--spp", type=int, default=10)
    args = parser.parse_args()
    enable_persistent_cache()

    rc = 0
    for name in args.scenes.split(","):
        results = {}
        for backend in ("fused", "fused1"):
            scene = load_scene(
                f"/root/reference/{name}.scene",
                config_overrides=dict(rays_per_pixel=args.spp,
                                      packet_backend=backend),
            )
            _img, _ = pipeline.render_timed(scene)  # warm
            img, seconds = pipeline.render_timed(scene)
            results[backend] = (np.asarray(img), seconds)
        equal = bool((results["fused"][0] == results["fused1"][0]).all())
        print(json.dumps({
            "scan": "ab_fullres", "scene": name, "spp": args.spp,
            "equal": equal,
            "fused_s": round(results["fused"][1], 3),
            "fused1_s": round(results["fused1"][1], 3),
        }), flush=True)
        if not equal:
            diff = results["fused"][0] != results["fused1"][0]
            print(json.dumps({"scan": "mismatch_frac",
                              "scene": name,
                              "frac": float(diff.mean())}), flush=True)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
