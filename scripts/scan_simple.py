"""A/B the simple-scene shading-path variants on hardware (RT_SHADE_OPT).

The round-4 verdict's Weak #3: spheres (4 prims, brute intersector, no sort)
at 1000^2 x 100 spp is 4x behind a GTX 1080 and nobody had profiled it.
PROFILE_r05 (scripts/profile_render.py) pinned ~half the render on XLA
re-computing the per-bounce PCG chain inside four (R, 1)-shaped sine/cosine
fusions per bounce. This scan renders warm at each RT_SHADE_OPT level in a
fresh subprocess (the knob is read at import) and prints a JSON row per
config.

Usage: python scripts/scan_simple.py [--scenes spheres,cornell] [--spp 100]
         [--size 1000] [--opts 0,1,2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time, warnings
warnings.filterwarnings("ignore")
sys.path.insert(0, "/root/repo")
import jax
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render.pipeline import render_framebuffer
from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
name, size, spp = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
scene = load_scene(
    f"/root/reference/{name}.scene",
    config_overrides=dict(width=size, height=size, rays_per_pixel=spp, bounces=10),
)
jax.block_until_ready(render_framebuffer(scene))  # compile
t0 = time.perf_counter()
jax.block_until_ready(render_framebuffer(scene))
print(json.dumps({"warm_s": round(time.perf_counter() - t0, 3)}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="spheres,cornell")
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--opts", default="0,1,2")
    args = ap.parse_args()

    for opt in args.opts.split(","):
        for scene in args.scenes.split(","):
            env = dict(os.environ, RT_SHADE_OPT=opt)
            out = subprocess.run(
                [sys.executable, "-c", CHILD, scene, str(args.size), str(args.spp)],
                env=env, capture_output=True, text=True, timeout=1800,
            )
            row = {"scene": scene, "shade_opt": int(opt), "spp": args.spp}
            try:
                row.update(json.loads(out.stdout.strip().splitlines()[-1]))
            except Exception:
                row["error"] = (out.stderr or out.stdout)[-500:]
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
