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

    # Paired-sub-cluster tables (cluster_pack=2, round 5): the packed
    # fused1 kernel — split-plane chunk cull, dual word planes, (block,
    # halfmask) ring, lane-masked MT — against the XLA reference on the
    # SAME geometry cut unpacked at C_sub. The effective pair sets are
    # identical by construction; these rows certify the pack path's Mosaic
    # lowering on hardware, flat (cull_hier=-1) and chunk-gated.
    for ct2, hier in ((128, -1), (128, 16), (256, 16)):
        packed = load_scene(
            "/root/reference/teapot.scene",
            config_overrides=dict(
                width=128, height=128, rays_per_pixel=2, bounces=4,
                cluster_pack=2, cull_hier=hier,
            ),
            cluster_tris=ct2,
        )
        unpacked = load_scene(
            "/root/reference/teapot.scene",
            config_overrides=dict(
                width=128, height=128, rays_per_pixel=2, bounces=4,
            ),
            cluster_tris=ct2 // 2,
        )
        for name, st in (("teapot_primary", s0), ("teapot_b1_sorted", s1s)):
            alive = jnp.any(st.transmitted != 0.0, axis=-1)
            cl = jnp.where(alive, t0, -1.0)
            ref = pi.closest_hit_packet(
                unpacked, st.origin, st.direction, cl, i0,
                cap=unpacked.num_clusters, backend="xla",
            )
            for tile in (64, 32):
                got = pi.closest_hit_packet(
                    packed, st.origin, st.direction, cl, i0,
                    cap=packed.num_clusters, tile=tile, backend="fused1",
                )
                check(
                    f"{name}/fused1_pack2_C{ct2}_hier{hier}/tile{tile}",
                    ref, got,
                )

    # Lamp-scale: the cluster-block table (~28 MB at C=256) exceeds
    # fused.RESIDENT_BYTES, so packet_intersect splits it into VMEM-resident
    # shards swept independently and min-merged — these rows certify the
    # shard path's Mosaic lowering (incl. per-shard entry/mask slicing for
    # the skip) at lamp's real cluster count. Reference: the legacy Pallas
    # sweep with an uncapped pair budget (exact; the XLA path's dense
    # (T, cap, tile) candidate buffer is infeasible at cap = K here).
    lamp = load_scene(
        "/root/reference/lamp.scene",
        config_overrides=dict(width=128, height=128, rays_per_pixel=2, bounces=4),
    )
    from cuda_raytracer_tpu.ops.pallas import fused as pallas_fused

    n_shards = -(-lamp.cluster_blocks.size * 4 // pallas_fused.RESIDENT_BYTES)
    assert n_shards > 1, "lamp cluster table unexpectedly fits VMEM"
    sl0 = wavefront.make_initial_state(
        lamp, jnp.arange(lamp.num_pixels * 2, dtype=jnp.int32), 2, jnp.uint32(0)
    )
    sl1, _ = wavefront.process_rays(lamp, sl0, jnp.uint32(0), 0)
    sl1s = wavefront.reorder_rays(lamp, sl1)
    tL = jnp.full((lamp.num_pixels * 2,), intersect.MISS)
    iL = jnp.full((lamp.num_pixels * 2,), -1, jnp.int32)
    capL = lamp.num_clusters
    for name, st in (("lamp_primary", sl0), ("lamp_b1_sorted", sl1s)):
        alive = jnp.any(st.transmitted != 0.0, axis=-1)
        cl = jnp.where(alive, tL, -1.0)
        ref = pi.closest_hit_packet(
            lamp, st.origin, st.direction, cl, iL,
            cap=capL, tile=128, backend="pallas",
        )
        for tile, skip in ((64, False), (64, True), (32, True)):
            got = pi.closest_hit_packet(
                lamp, st.origin, st.direction, cl, iL,
                cap=capL, tile=tile, backend="fused", skip=skip,
            )
            check(
                f"{name}/fused_shards{n_shards}_skip{int(skip)}/tile{tile}",
                ref, got,
            )
        # fused1 on the sharded table (plan_shards > 1 at lamp scale):
        # certifies the single-program kernel's per-shard cull/pack/walk/
        # sweep + the XLA shard merge, gated and flat.
        for tile, hier in ((64, 0), (64, -1), (32, 0)):
            sc = lamp
            if hier:
                import dataclasses

                sc = lamp.replace(
                    config=dataclasses.replace(lamp.config, cull_hier=hier)
                )
            got = pi.closest_hit_packet(
                sc, st.origin, st.direction, cl, iL,
                cap=capL, tile=tile, backend="fused1",
            )
            check(f"{name}/fused1_hier{hier}/tile{tile}", ref, got)

    # fused1 v2 (single-program closest-hit, TILE_BLOCK grid): in-kernel
    # gated cull (cull_hier 0 = auto G=16; -1 = flat), entry-only scratch,
    # dead-tile early-out — certify the Mosaic lowering on primary and
    # b1-sorted teapot wavefronts at the production C=256 table.
    import dataclasses

    for name, st in (("teapot_primary", s0), ("teapot_b1_sorted", s1s)):
        alive = jnp.any(st.transmitted != 0.0, axis=-1)
        cl = jnp.where(alive, t0, -1.0)
        ref = pi.closest_hit_packet(
            scene, st.origin, st.direction, cl, i0, cap=cap, backend="xla"
        )
        for tile, hier in ((64, 0), (64, -1), (32, 0), (128, 0)):
            sc = scene.replace(
                config=dataclasses.replace(scene.config, cull_hier=hier)
            )
            got = pi.closest_hit_packet(
                sc, st.origin, st.direction, cl, i0,
                cap=cap, tile=tile, backend="fused1",
            )
            check(f"{name}/fused1_hier{hier}/tile{tile}", ref, got)

    report["ok"] = ok
    out_path = sys.argv[1] if len(sys.argv) > 1 else "TPU_PARITY.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"tpu_parity_ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
