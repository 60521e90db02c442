"""On-hardware Pallas correctness artifact (VERDICT round-1 item 7).

The CPU test suite exercises the Pallas kernels only in interpret mode; this
script runs the real Mosaic-compiled kernels on the TPU and checks
bit-equality of the closest-hit results against the XLA reference path, over
primary and bounced (Morton-sorted) teapot wavefronts and a random-cloud
scene, for both fused-kernel variants and the legacy sweep kernel.

Writes a JSON verdict (default TPU_PARITY.json) — committed per round.

Usage: python scripts/tpu_parity.py [out.json]
"""

import json
import sys
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.ops import intersect, packet_intersect as pi
    from cuda_raytracer_tpu.render import wavefront

    if jax.default_backend() == "cpu":
        print("needs the TPU backend", file=sys.stderr)
        return 2

    report = {"backend": jax.default_backend(), "checks": []}
    ok = True

    def check(name, a, b):
        nonlocal ok
        t_eq = bool(jnp.array_equal(a[0], b[0]))
        i_eq = bool(jnp.array_equal(a[1], b[1]))
        entry = {"name": name, "t_bitequal": t_eq, "index_bitequal": i_eq}
        report["checks"].append(entry)
        ok = ok and t_eq and i_eq
        print(entry, flush=True)

    scene = load_scene(
        "/root/reference/teapot.scene",
        config_overrides=dict(width=128, height=128, rays_per_pixel=2, bounces=4),
    )
    R = scene.num_pixels * 2
    ray_id = jnp.arange(R, dtype=jnp.int32)
    s0 = wavefront.make_initial_state(scene, ray_id, 2, jnp.uint32(0))
    s1, _ = wavefront.process_rays(scene, s0, jnp.uint32(0), 0)
    s1s = wavefront.reorder_rays(scene, s1)
    t0 = jnp.full((R,), intersect.MISS)
    i0 = jnp.full((R,), -1, jnp.int32)
    # cap = K: the XLA reference's per-tile budget can then never drop a
    # cluster, so it is exact by construction for this comparison.
    cap = scene.num_clusters

    for name, st in (("teapot_primary", s0), ("teapot_b1_sorted", s1s)):
        alive = jnp.any(st.transmitted != 0.0, axis=-1)
        cl = jnp.where(alive, t0, -1.0)
        ref = pi.closest_hit_packet(
            scene, st.origin, st.direction, cl, i0, cap=cap, backend="xla"
        )
        for backend in ("fused", "pallas"):
            for tile in (32, 64, 128):
                got = pi.closest_hit_packet(
                    scene, st.origin, st.direction, cl, i0,
                    cap=cap, tile=tile, backend=backend,
                )
                check(f"{name}/{backend}/tile{tile}", ref, got)
        # Slab-entry early-out (packet_skip): must be bit-exact on hardware.
        for tile in (32, 64):
            got = pi.closest_hit_packet(
                scene, st.origin, st.direction, cl, i0,
                cap=cap, tile=tile, backend="fused", skip=True,
            )
            check(f"{name}/fused_skip/tile{tile}", ref, got)

    # Small-cluster table (C=128) and the paired-C=64 two-level cull
    # (cull_split=2): the candidate round-2 default config. Same rays, new
    # cluster cut — parity vs the XLA path on the same scene variant.
    # cull_hier=16 adds the super-AABB pre-pass + scalar-prefetch gated
    # cull kernel (ops/pallas/cull.cull_tiles_gated) — bit-equality of
    # THAT kernel's Mosaic lowering is what the hier rows certify.
    for ct, split, hier in ((128, 1, 0), (128, 2, 0), (128, 2, 16)):
        sc2 = load_scene(
            "/root/reference/teapot.scene",
            config_overrides=dict(
                width=128, height=128, rays_per_pixel=2, bounces=4,
                cull_split=split, cull_hier=hier,
            ),
            cluster_tris=ct,
        )
        cap2 = sc2.num_clusters
        for name, st in (("teapot_primary", s0), ("teapot_b1_sorted", s1s)):
            alive = jnp.any(st.transmitted != 0.0, axis=-1)
            cl = jnp.where(alive, t0, -1.0)
            ref = pi.closest_hit_packet(
                sc2, st.origin, st.direction, cl, i0, cap=cap2, backend="xla"
            )
            # tile=16 is the scan's smallest candidate — it engages the
            # widened MT batch (32, _mt_batch_for) whose Mosaic lowering
            # these rows certify.
            for tile, skip in ((16, True), (32, True), (64, True), (32, False)):
                got = pi.closest_hit_packet(
                    sc2, st.origin, st.direction, cl, i0,
                    cap=cap2, tile=tile, backend="fused", skip=skip,
                )
                check(
                    f"{name}/fused_C{ct}_split{split}_hier{hier}"
                    f"_skip{int(skip)}/tile{tile}", ref, got,
                )

    report["ok"] = ok
    out_path = sys.argv[1] if len(sys.argv) > 1 else "TPU_PARITY.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"tpu_parity_ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
