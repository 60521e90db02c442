"""Packet (ray-tile) intersector tests (ops/packet_intersect.py).

Same A/B acceptance as the clustered path: exact agreement with brute force
on distances (indices may differ only on exact distance ties), plus the
packet-specific machinery — tile padding, per-tile cap certificate, dead-ray
windows.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops import intersect, packet_intersect

from test_cluster import _scene_with_clusters

REF = "/root/reference"


def _random_rays(scene, n_rays, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.bvh_min[0])
    hi = np.asarray(scene.bvh_max[0])
    origin = jnp.asarray(rng.uniform(lo - 1, hi + 1, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return origin, jnp.asarray(d)


def _compare_with_brute(scene, n_rays=512, seed=0, cap=64, tile=128):
    origin, direction = _random_rays(scene, n_rays, seed)
    t0 = jnp.full((n_rays,), intersect.MISS)
    i0 = jnp.full((n_rays,), -1, jnp.int32)
    t_pk, i_pk, suspects = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0,
        tile=tile, cap=min(cap, scene.num_clusters),
    )
    assert int(suspects) == 0, f"certificate fired on {int(suspects)} rays"
    t_br, i_br = intersect.intersect_triangles_brute(
        origin, direction, scene.tri_p1, scene.tri_e1, scene.tri_e2
    )
    i_br = jnp.where(i_br >= 0, scene.sphere_count + i_br, i_br)
    np.testing.assert_allclose(np.asarray(t_pk), np.asarray(t_br), rtol=1e-5, atol=1e-5)
    mismatch = (np.asarray(i_pk) != np.asarray(i_br)).mean()
    assert mismatch < 0.01  # ties only


def test_packet_matches_brute_random_cloud():
    _compare_with_brute(_scene_with_clusters())


def test_packet_matches_brute_unaligned_ray_count():
    # R not a multiple of the tile exercises the padding path.
    _compare_with_brute(_scene_with_clusters(), n_rays=333)


def test_packet_matches_brute_small_tile():
    _compare_with_brute(_scene_with_clusters(), n_rays=256, tile=32)


def test_packet_matches_brute_teapot_sample():
    scene = load_scene(
        f"{REF}/teapot.scene",
        config_overrides=dict(width=8, height=8),
        cluster_tris=512,
    )
    assert scene.num_clusters > 100
    _compare_with_brute(scene, n_rays=256)


def test_packet_dead_rays_untouched():
    scene = _scene_with_clusters()
    origin, direction = _random_rays(scene, 256)
    # Dead rays carry a negative window; their (t, index) must pass through.
    t0 = jnp.full((256,), -1.0)
    i0 = jnp.full((256,), -7, jnp.int32)
    t, i, suspects = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=min(64, scene.num_clusters)
    )
    assert int(suspects) == 0
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i0))


def test_packet_certificate_fires_on_tiny_cap():
    """With cap=1 on a many-cluster scene, the certificate must flag rays
    (conservatively) rather than silently returning wrong hits."""
    scene = _scene_with_clusters()
    if scene.num_clusters < 3:
        pytest.skip("needs several clusters")
    origin, direction = _random_rays(scene, 256)
    t0 = jnp.full((256,), intersect.MISS)
    i0 = jnp.full((256,), -1, jnp.int32)
    t_pk, i_pk, suspects = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=1
    )
    t_br, _ = intersect.intersect_triangles_brute(
        origin, direction, scene.tri_p1, scene.tri_e1, scene.tri_e2
    )
    wrong = ~np.isclose(np.asarray(t_pk), np.asarray(t_br), rtol=1e-5, atol=1e-5)
    # every actually-wrong ray must be covered by the certificate count
    assert int(suspects) >= int(wrong.sum())


def test_packet_pallas_backend_matches_xla():
    """The Pallas sweep kernel (interpret mode on CPU) must agree with the
    XLA while_loop sweep bit-for-bit — same MT arithmetic, same tie-break."""
    scene = _scene_with_clusters()
    origin, direction = _random_rays(scene, 333)
    t0 = jnp.full((333,), intersect.MISS)
    i0 = jnp.full((333,), -1, jnp.int32)
    cap = min(64, scene.num_clusters)
    t_x, i_x, s_x = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap
    )
    t_p, i_p, s_p = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap, backend="pallas_interpret"
    )
    assert int(s_x) == int(s_p) == 0
    np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_p))


def test_packet_fused_backend_matches_xla():
    """The fused walk+sweep kernel (interpret mode on CPU) must agree with
    the XLA path bit-for-bit — same MT arithmetic, same tie-break — through
    both its variants: VMEM-resident blocks and the DMA-wave fallback."""
    from cuda_raytracer_tpu.ops.pallas import fused as pallas_fused

    scene = _scene_with_clusters(tri_count=3000, cluster_tris=128)
    origin, direction = _random_rays(scene, 333)
    t0 = jnp.full((333,), intersect.MISS)
    i0 = jnp.full((333,), -1, jnp.int32)
    cap = min(64, scene.num_clusters)
    t_x, i_x, s_x = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap
    )
    # resident_bytes None → single-shard resident; tiny → multi-shard
    # resident (the lamp-sized-table path); 0 → the DMA-wave fallback.
    for tile, resident_bytes in ((32, None), (128, None), (64, 1 << 19), (64, 0)):
        old = pallas_fused.RESIDENT_BYTES
        if resident_bytes is not None:
            pallas_fused.RESIDENT_BYTES = resident_bytes  # force wave variant
        try:
            jax.clear_caches()
            t_f, i_f, s_f = packet_intersect.closest_hit_packet(
                scene, origin, direction, t0, i0, cap=cap, tile=tile,
                backend="fused_interpret",
            )
        finally:
            pallas_fused.RESIDENT_BYTES = old
            # restore jit caches polluted by the monkeypatched constant
            jax.clear_caches()
        assert int(s_x) == int(s_f) == 0
        np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_f))
        np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))


def test_packet_fused1_backend_matches_xla():
    """The single-program closest-hit (ops/pallas/fused1.py, interpret mode)
    must agree with the XLA path bit-for-bit — same slab expression tree,
    same MT core, same tie-break, and the per-ray-entry early-out must be
    invisible in results. Covers single-shard and forced multi-shard."""
    from cuda_raytracer_tpu.ops.pallas import fused as pallas_fused

    scene = _scene_with_clusters(tri_count=3000, cluster_tris=128)
    origin, direction = _random_rays(scene, 333)
    t0 = jnp.full((333,), intersect.MISS)
    i0 = jnp.full((333,), -1, jnp.int32)
    cap = min(64, scene.num_clusters)
    t_x, i_x, s_x = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap
    )
    for tile, resident_bytes in ((64, None), (32, None), (64, 1 << 16)):
        old = pallas_fused.RESIDENT_BYTES
        if resident_bytes is not None:
            pallas_fused.RESIDENT_BYTES = resident_bytes  # force shards
        try:
            jax.clear_caches()
            t_f, i_f, s_f = packet_intersect.closest_hit_packet(
                scene, origin, direction, t0, i0, cap=cap, tile=tile,
                backend="fused1_interpret",
            )
        finally:
            pallas_fused.RESIDENT_BYTES = old
            jax.clear_caches()
        assert int(s_x) == int(s_f) == 0
        np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_f))
        np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))


def test_packet_fused1_gated_cull_matches_flat():
    """The fused1 in-kernel chunk-gated cull (cull_hier = G clusters per
    tight super box) must be invisible in results: gating is conservative
    (a sub-box slab hit implies its super hits, by interval inclusion under
    the windowed test), so the emitted pair set — hence every output bit —
    matches the flat cull and the XLA reference."""
    import dataclasses

    scene = _scene_with_clusters(tri_count=15000, cluster_tris=128)
    assert scene.num_clusters > 128, "need > 1 cull chunk for gating"
    origin, direction = _random_rays(scene, 333)
    t0 = jnp.full((333,), intersect.MISS)
    i0 = jnp.full((333,), -1, jnp.int32)
    # Full cap: with K > 128 clusters a 64-pair tile budget overflows the
    # XLA reference's certificate on this dense random cloud.
    cap = scene.num_clusters
    t_x, i_x, s_x = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap
    )
    gated = scene.replace(
        config=dataclasses.replace(scene.config, cull_hier=16)
    )
    for sc in (scene, gated):
        t_f, i_f, s_f = packet_intersect.closest_hit_packet(
            sc, origin, direction, t0, i0, cap=cap, tile=64,
            backend="fused1_interpret",
        )
        assert int(s_x) == int(s_f) == 0
        np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_f))
        np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))


def test_packet_fused1_paired_pack_matches_unpacked():
    """cluster_pack=2 (paired sub-clusters, PERF_NOTES roadmap item 0): the
    packed fused1 path — sub-cluster-granularity cull, split-plane chunk
    layout, half-masked 128-lane sweep — must be bit-identical to the
    UNPACKED pipeline on the same geometry cut at the same sub-cluster size
    (cluster_tris=64, pack=1): the effective (tile, sub-cluster) pair set is
    identical, and min + larger-id-tie folding is order-independent. Covers
    flat and chunk-gated culls, and a forced multi-shard split."""
    import dataclasses

    from cuda_raytracer_tpu.ops.pallas import fused as pallas_fused

    n = 384
    # ~6000 triangles → ~150 sub-clusters at C_sub=64 → >1 cull chunk, so
    # the split-plane permutation, padding mask and gate all engage (kept
    # just past the chunk boundary: interpret-mode minutes scale with K).
    scene64 = _scene_with_clusters(tri_count=6000, cluster_tris=64)
    origin, direction = _random_rays(scene64, n)
    t0 = jnp.full((n,), intersect.MISS)
    i0 = jnp.full((n,), -1, jnp.int32)
    t_ref, i_ref, s_ref = packet_intersect.closest_hit_packet(
        scene64, origin, direction, t0, i0, cap=scene64.num_clusters
    )
    assert int(s_ref) == 0

    packed = _scene_with_clusters(
        tri_count=6000, cluster_tris=128,
        config_overrides=dict(cluster_pack=2),
    )
    assert packed.cluster_blocks.shape[2] == 128
    assert packed.num_clusters % 2 == 0  # padded to a pack multiple
    # blocks = K/2 paired blocks + the dummy sentinel row
    assert packed.cluster_blocks.shape[0] == packed.num_clusters // 2 + 1

    gated = packed.replace(
        config=dataclasses.replace(packed.config, cull_hier=16)
    )
    for label, sc, resident in (
        ("flat", packed, None),
        ("gated", gated, None),
        ("sharded", packed, 1 << 18),
    ):
        old = pallas_fused.RESIDENT_BYTES
        if resident is not None:
            pallas_fused.RESIDENT_BYTES = resident
        try:
            jax.clear_caches()
            t_p, i_p, s_p = packet_intersect.closest_hit_packet(
                sc, origin, direction, t0, i0, tile=64,
                cap=sc.num_clusters, backend="fused1_interpret",
            )
        finally:
            pallas_fused.RESIDENT_BYTES = old
            jax.clear_caches()
        assert int(s_p) == 0, label
        np.testing.assert_array_equal(
            np.asarray(t_ref), np.asarray(t_p), err_msg=label
        )
        np.testing.assert_array_equal(
            np.asarray(i_ref), np.asarray(i_p), err_msg=label
        )


def test_packet_pack_rejects_other_backends():
    """Packed tables break the box↔block map every non-fused1 engine indexes
    by — the guard must fail fast, not sweep the wrong triangles."""
    packed = _scene_with_clusters(
        tri_count=3000, cluster_tris=128, config_overrides=dict(cluster_pack=2),
    )
    origin, direction = _random_rays(packed, 64)
    t0 = jnp.full((64,), intersect.MISS)
    i0 = jnp.full((64,), -1, jnp.int32)
    with pytest.raises(ValueError, match="cluster_pack"):
        packet_intersect.closest_hit_packet(
            packed, origin, direction, t0, i0, backend="xla"
        )


def test_packet_two_round_matches_single_round():
    """The front-to-back two-round sweep (round 1: nearest clusters; round 2:
    tmax-tightened re-cull of the rest) must be exact — identical to the
    single full sweep — on a many-cluster scene (pallas interpret backend)."""
    scene = _scene_with_clusters(tri_count=3000, cluster_tris=64)
    assert scene.num_clusters > packet_intersect.ROUND1_NEAREST
    origin, direction = _random_rays(scene, 384)
    t0 = jnp.full((384,), intersect.MISS)
    i0 = jnp.full((384,), -1, jnp.int32)
    cap = min(64, scene.num_clusters)
    t_1, i_1, s_1 = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap,
        backend="pallas_interpret", two_round=False,
    )
    t_2, i_2, s_2 = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap,
        backend="pallas_interpret", two_round=True,
    )
    assert int(s_1) == int(s_2) == 0
    np.testing.assert_array_equal(np.asarray(t_1), np.asarray(t_2))
    np.testing.assert_array_equal(np.asarray(i_1), np.asarray(i_2))
    # The fused backend's front-to-back variant must be exact too.
    t_3, i_3, s_3 = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap,
        backend="fused_interpret", two_round=True,
    )
    assert int(s_3) == 0
    np.testing.assert_array_equal(np.asarray(t_1), np.asarray(t_3))
    np.testing.assert_array_equal(np.asarray(i_1), np.asarray(i_3))


def test_render_overflow_raises_or_retries():
    """A pair-budget overflow during a real render must never silently
    corrupt the image (the reference's CUDA_CHECK ethos, common.cuh:10-18):
    with auto_retry=False it raises; by default it re-renders with a doubled
    cap until the certificate is clean, and the result matches a render that
    started with an adequate cap."""
    import dataclasses

    from cuda_raytracer_tpu.render.pipeline import render_framebuffer

    scene = _scene_with_clusters(tri_count=3000, cluster_tris=128)
    if scene.num_clusters < 3:
        pytest.skip("needs several clusters")
    tiny_cap = dataclasses.replace(
        scene.config, packet_cap=1, intersector="packet", sort_rays=False
    )
    tiny = scene.replace(config=tiny_cap)
    with pytest.raises(RuntimeError, match="exactness certificate"):
        render_framebuffer(tiny, auto_retry=False)

    with pytest.warns(UserWarning, match="re-rendering with packet_cap"):
        fb_retry = np.asarray(render_framebuffer(tiny))
    big_cap = dataclasses.replace(
        scene.config, packet_cap=scene.num_clusters, intersector="packet",
        sort_rays=False,
    )
    fb_direct = np.asarray(render_framebuffer(scene.replace(config=big_cap)))
    np.testing.assert_array_equal(fb_retry, fb_direct)


def test_resume_does_not_launder_certificate(tmp_path):
    """A checkpointed render whose passes overflowed persists the suspect
    count; resuming the finished checkpoint must re-raise (or retry), not
    silently return the image the certificate rejected."""
    import dataclasses

    from cuda_raytracer_tpu.render.pipeline import render_framebuffer

    scene = _scene_with_clusters(tri_count=3000, cluster_tris=128)
    if scene.num_clusters < 3:
        pytest.skip("needs several clusters")
    tiny_cap = dataclasses.replace(
        scene.config, packet_cap=1, intersector="packet", sort_rays=False
    )
    tiny = scene.replace(config=tiny_cap)
    path = str(tmp_path / "render.npz")
    with pytest.raises(RuntimeError, match="exactness certificate"):
        render_framebuffer(tiny, checkpoint_path=path, auto_retry=False)
    # The checkpoint now claims all samples done — but carries the suspects.
    with pytest.raises(RuntimeError, match="exactness certificate"):
        render_framebuffer(tiny, checkpoint_path=path, auto_retry=False)


def test_packet_nearest_ranking_keeps_close_hits():
    """Even with a cap that drops clusters, kept clusters are the nearest —
    rays whose hit lies in the nearest cluster stay correct."""
    scene = _scene_with_clusters()
    cap = min(4, scene.num_clusters)
    origin, direction = _random_rays(scene, 512)
    t0 = jnp.full((512,), intersect.MISS)
    i0 = jnp.full((512,), -1, jnp.int32)
    t_pk, _, suspects = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0, cap=cap
    )
    t_br, _ = intersect.intersect_triangles_brute(
        origin, direction, scene.tri_p1, scene.tri_e1, scene.tri_e2
    )
    ok = np.isclose(np.asarray(t_pk), np.asarray(t_br), rtol=1e-5, atol=1e-5)
    # all disagreements are flagged
    assert int(suspects) >= int((~ok).sum())


def test_fused_skip_matches_no_skip():
    """The slab-entry early-out (skip=True) must be bit-identical to the
    full sweep: the SKIP_SLACK threshold only discards pair groups whose
    entry lies strictly beyond every ray's current bound. Exercised with
    finite incoming windows (sphere-style bounds), dead rays (negative
    window), the single-shard and multi-shard resident variants, and the
    two-round front-to-back mode."""
    from cuda_raytracer_tpu.ops.pallas import fused as pallas_fused

    scene = _scene_with_clusters(tri_count=3000, cluster_tris=64)
    n = 384
    origin, direction = _random_rays(scene, n)
    rng = np.random.default_rng(3)
    # Mixed incoming windows: open (MISS), finite bounds, and dead rays.
    t0 = np.full((n,), intersect.MISS, np.float32)
    t0[: n // 3] = rng.uniform(0.5, 50.0, n // 3).astype(np.float32)
    t0[n // 3 : n // 3 + 16] = -1.0  # dead
    t0 = jnp.asarray(t0)
    i0 = jnp.full((n,), -1, jnp.int32)
    cap = min(64, scene.num_clusters)

    def run(skip, tile=64, resident_bytes=None, two_round=False):
        old = pallas_fused.RESIDENT_BYTES
        if resident_bytes is not None:
            pallas_fused.RESIDENT_BYTES = resident_bytes
        try:
            jax.clear_caches()
            return packet_intersect.closest_hit_packet(
                scene, origin, direction, t0, i0, cap=cap, tile=tile,
                backend="fused_interpret", skip=skip, two_round=two_round,
            )
        finally:
            if resident_bytes is not None:
                pallas_fused.RESIDENT_BYTES = old
                jax.clear_caches()

    for kwargs in (
        dict(),
        dict(tile=32),
        dict(tile=16),  # smallest scan candidate; exercises MT batch 32
        dict(resident_bytes=1 << 19),  # multi-shard resident
        dict(two_round=True),
    ):
        t_a, i_a, s_a = run(False, **kwargs)
        t_b, i_b, s_b = run(True, **kwargs)
        assert int(s_a) == int(s_b) == 0
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))


def test_cull_split_matches_single_box():
    """The two-level cull (cull_split=S tight chunk boxes per block,
    OR-reduced) must be bit-identical to the single-node-box cull on every
    backend: cull tightness only prunes pairs that cannot hit, never the
    winning pair. Covers xla (capped, cap=K so exact), fused interpret,
    and the fused + packet_skip combination (where the tighter chunk
    entries also feed the early-out)."""
    n = 384
    scenes = {
        s: _scene_with_clusters(
            tri_count=3000, cluster_tris=128,
            config_overrides=dict(cull_split=s) if s > 1 else None,
        )
        for s in (1, 4)
    }
    assert scenes[4].cluster_min.shape[0] == 4 * scenes[4].num_clusters
    origin, direction = _random_rays(scenes[1], n)
    t0 = jnp.full((n,), intersect.MISS)
    i0 = jnp.full((n,), -1, jnp.int32)
    cap = scenes[1].num_clusters  # exact capped path

    def run(scene, **kw):
        return packet_intersect.closest_hit_packet(
            scene, origin, direction, t0, i0, cap=cap, tile=64, **kw
        )

    for kw in (
        dict(backend="xla"),
        dict(backend="fused_interpret"),
        dict(backend="fused_interpret", skip=True),
        dict(backend="pallas_interpret", two_round=True),
    ):
        t_1, i_1, s_1 = run(scenes[1], **kw)
        t_4, i_4, s_4 = run(scenes[4], **kw)
        assert int(s_1) == int(s_4) == 0, kw
        np.testing.assert_array_equal(np.asarray(t_1), np.asarray(t_4))
        np.testing.assert_array_equal(np.asarray(i_1), np.asarray(i_4))

    # And against brute force: the split cull must not lose any hit.
    t_br, _ = intersect.intersect_triangles_brute(
        origin, direction, scenes[4].tri_p1, scenes[4].tri_e1, scenes[4].tri_e2
    )
    t_s, _, _ = run(scenes[4], backend="fused_interpret", skip=True)
    np.testing.assert_allclose(
        np.asarray(t_s), np.asarray(jnp.minimum(t_br, intersect.MISS)),
        rtol=1e-6, atol=1e-6,
    )


def test_cull_mask_bits_match_per_ray_slab():
    """cull_tiles(with_mask=True) must set bit r of word w for exactly the
    rays whose individual slab test hits (the per-ray early-out is only
    exact if a set bit == 'this ray can reach triangles in this box'), and
    the OR of the bits must match the tile-level hit mask (entry <
    MISS_ENTRY)."""
    from cuda_raytracer_tpu.ops.pallas import cull as pallas_cull
    from cuda_raytracer_tpu.ops.traverse import _safe_inv_dir

    scene = _scene_with_clusters(tri_count=1200, cluster_tris=128)
    K = scene.num_clusters
    tile = 64
    n = 256
    origin, direction = _random_rays(scene, n)
    window = jnp.full((n,), intersect.MISS)
    # mark a few rays dead (negative window rejects every box)
    window = window.at[::7].set(-1.0)
    T = n // tile

    comps = [origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             window, jnp.zeros((n,), jnp.float32)]
    od8 = jnp.stack([v.reshape(T, tile) for v in comps], axis=1)
    od8 = jnp.pad(od8, ((0, 1), (0, 0), (0, 128 - tile)))
    aabb = jnp.concatenate(
        [scene.cluster_min.T, scene.cluster_max.T, jnp.zeros((2, K))], axis=0
    ).astype(jnp.float32)

    entry, maskw = pallas_cull.cull_tiles(
        od8, aabb, tile=tile, interpret=True, with_mask=True
    )
    assert maskw.shape == (T, 2, K) and maskw.dtype == jnp.int32

    # Per-ray oracle: the XLA slab test, one ray per "tile".
    inv = _safe_inv_dir(direction)
    m_ray, _ = packet_intersect._cull_tile_mask(
        origin, inv, window, scene.cluster_min, scene.cluster_max, tile=1
    )  # (n, K) bool
    m_ray = np.asarray(m_ray).reshape(T, tile, K)
    mw = np.asarray(maskw).astype(np.uint32)
    for w in range(2):
        got = (mw[:, w, :][:, None, :] >> np.arange(32)[None, :, None]) & 1
        want = m_ray[:, 32 * w : 32 * (w + 1), :].astype(np.uint32)
        np.testing.assert_array_equal(got, want)
    # OR over rays == tile-level hit mask
    np.testing.assert_array_equal(
        (mw[:, 0] | mw[:, 1]) != 0,
        np.asarray(entry) < pallas_cull.MISS_ENTRY * 0.5,
    )


def test_cull_hier_matches_flat():
    """The hierarchical cull (cull_hier=G: super-AABB pre-pass gating
    128-column chunks of the main cull) must be bit-identical to the flat
    cull end to end: the gate is conservative (a sub-box hit implies its
    super-box hits), so gated-off chunks are exactly the all-miss chunks.
    Covers the fused path with and without the per-ray early-out (whose
    entry/mask inputs now come from the gated kernel) and the legacy
    pallas sweep path."""
    n = 384
    mk = lambda hier: _scene_with_clusters(
        tri_count=6000, cluster_tris=32,
        config_overrides=dict(
            cull_split=2, **(dict(cull_hier=hier) if hier else {})
        ),
    )
    flat, hier = mk(0), mk(16)
    KS = hier.cluster_min.shape[0]
    assert KS >= 256, f"hier gate idle at KS={KS}; grow tri_count"
    origin, direction = _random_rays(flat, n)
    t0 = jnp.full((n,), intersect.MISS)
    # a few dead rays: their tiles must gate off cleanly
    t0 = t0.at[5::17].set(-1.0)
    i0 = jnp.full((n,), -1, jnp.int32)

    def run(scene, **kw):
        return packet_intersect.closest_hit_packet(
            scene, origin, direction, t0, i0,
            cap=scene.num_clusters, tile=64, **kw
        )

    for kw in (
        dict(backend="fused_interpret"),
        dict(backend="fused_interpret", skip=True),
        dict(backend="pallas_interpret"),
        dict(backend="pallas_interpret", two_round=True),
    ):
        t_f, i_f, s_f = run(flat, **kw)
        t_h, i_h, s_h = run(hier, **kw)
        assert int(s_f) == int(s_h) == 0, kw
        np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_h), err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_h), err_msg=str(kw))


def test_cull_gated_kernel_identity():
    """cull_tiles_gated == cull_tiles on the same padded table, both with
    all-ones gates (every chunk computed) and with gates derived from the
    actual chunk contents — entries AND packed per-ray mask words."""
    from cuda_raytracer_tpu.ops.pallas import cull as pallas_cull

    scene = _scene_with_clusters(tri_count=4000, cluster_tris=32)
    K = scene.num_clusters
    tile = 64
    n = 256
    origin, direction = _random_rays(scene, n)
    window = jnp.full((n,), intersect.MISS)
    window = window.at[::9].set(-1.0)
    T = n // tile

    comps = [origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             window, jnp.zeros((n,), jnp.float32)]
    od8 = jnp.stack([v.reshape(T, tile) for v in comps], axis=1)
    od8 = jnp.pad(od8, ((0, 1), (0, 0), (0, 128 - tile)))

    GCH = pallas_cull.GATE_CHUNK
    Kp = -(-K // GCH) * GCH
    pad_cols = jnp.full((3, Kp - K), 1e17, jnp.float32)
    aabb = jnp.concatenate(
        [
            jnp.concatenate([scene.cluster_min.T.astype(jnp.float32), pad_cols], axis=1),
            jnp.concatenate([scene.cluster_max.T.astype(jnp.float32), pad_cols], axis=1),
            jnp.zeros((2, Kp), jnp.float32),
        ],
        axis=0,
    )
    nch = Kp // GCH
    e_ref, m_ref = pallas_cull.cull_tiles(
        od8, aabb, tile=tile, interpret=True, with_mask=True
    )

    ones = jnp.full((T * (-(-nch // 32)),), -1, jnp.int32)  # all bits set
    e_a, m_a = pallas_cull.cull_tiles_gated(
        od8, aabb, ones, tile=tile, interpret=True, with_mask=True
    )
    np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_a))
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_a))

    # Real gates: chunk live iff any of its columns is hit in the flat cull
    # (the tightest correct gate; the super-box gate is a superset of it).
    hit = np.asarray(e_ref) < pallas_cull.MISS_ENTRY * 0.5  # (T, Kp)
    gate = hit.reshape(T, nch, GCH).any(axis=2)
    Wg = -(-nch // 32)
    bits = np.zeros((T, Wg * 32), np.int64)
    bits[:, :nch] = gate
    words = (bits.reshape(T, Wg, 32) << np.arange(32)).sum(axis=2)
    gates = jnp.asarray(
        (words & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    ).reshape(-1)
    e_b, m_b = pallas_cull.cull_tiles_gated(
        od8, aabb, gates, tile=tile, interpret=True, with_mask=True
    )
    np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_b))
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_b))


def test_fused_tile_chunk_budget_guard():
    """Very wide cluster tables (only reachable via the budget=0 DMA-wave
    escape hatch) must fail loudly instead of silently overshooting the
    SMEM metadata budget at the minimum tile chunk."""
    from cuda_raytracer_tpu.ops.pallas import fused as pallas_fused

    assert pallas_fused._tile_chunk(96, 16) >= 8  # normal shard widths fit
    with pytest.raises(ValueError, match="SMEM budget"):
        pallas_fused._tile_chunk(1040, 79)
