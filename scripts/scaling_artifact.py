"""Emit a SCALING.json artifact: scaling_report on the widest available mesh.

On a multi-chip TPU host this measures real ICI scaling (the ≥85% efficiency
acceptance metric, SURVEY §7.6). On this rig (one tunneled chip) it falls
back to the 8-device virtual CPU mesh, which shares host cores — the numbers
then validate the *harness*, not the hardware; the artifact records which
mode produced them.

Usage: python scripts/scaling_artifact.py [out.json]
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    # The device-count flag must be in place before ANY backend client is
    # created (XLA parses it once); harmless when the TPU path is taken.
    flag = "--xla_force_host_platform_device_count=8"
    if flag not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + flag

    import jax

    # TPU mode is opt-in (--tpu): probing the accelerator backend would
    # block whenever the one tunneled chip is claimed elsewhere, and this
    # rig never has >1 real chip anyway. On a real multi-chip slice run
    # with --tpu to measure ICI scaling.
    if "--tpu" in sys.argv and len(jax.devices()) >= 2:
        mode = "tpu"
    else:
        from cuda_raytracer_tpu.utils.backend import force_cpu

        force_cpu()
        mode = "virtual_cpu"

    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.parallel import mesh as mesh_mod
    from cuda_raytracer_tpu.parallel import shard

    scene = load_scene(
        "/root/reference/cornell.scene",
        config_overrides=dict(width=64, height=64, rays_per_pixel=4, bounces=4),
    )
    mesh = mesh_mod.make_mesh()
    report = shard.scaling_report(scene, mesh, rays_per_pixel=4, repeats=3)
    out = {
        "mode": mode,
        "devices": int(mesh.devices.size),
        "scene": "cornell 64x64x4spp 4 bounces",
        **{k: float(v) for k, v in report.items()},
    }
    if mode == "virtual_cpu":
        # N virtual devices share one host's cores, so per-device throughput
        # CANNOT scale and the ICI efficiency metric is undefined here. The
        # meaningful number on this mode is the sharding overhead: the full
        # pipeline partitioned N ways + psum accumulation vs the same work on
        # one device of the same silicon.
        n = int(mesh.devices.size)
        out.pop("scaling_efficiency", None)
        out["sharding_overhead"] = 1.0 - out[f"{n}dev"] / out["1dev"]
        out["scaling_efficiency_note"] = (
            "undefined on a virtual CPU mesh (shared host cores); "
            "requires a real multi-chip slice — see sharding_overhead"
        )
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
