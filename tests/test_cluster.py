"""Cluster-cut build tests (models/cluster.py).

The cluster cut is the TPU-native acceleration structure: a BVH cut at
subtrees of <= C triangles, packed into uniform (K, 16, C) blocks. The
intersector built on it is tested in test_packet.py; here we verify the
structural invariants of the cut and the packed-block layout.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_raytracer_tpu.models import bvh as bvh_mod
from cuda_raytracer_tpu.models import cluster as cluster_mod
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops import camera as camera_ops
from cuda_raytracer_tpu.ops import intersect, packet_intersect

from test_bvh import random_triangles

REF = "/root/reference"


def test_cluster_cut_partitions_triangles():
    p1, p2, p3 = random_triangles(5000, seed=4)
    built = bvh_mod.build_bvh_numpy(p1, p2, p3)
    clusters = cluster_mod.build_clusters(built, 5000, max_tris=256)
    spans = sorted(
        (int(s), int(s + c)) for s, c in zip(clusters.start, clusters.count)
    )
    pos = 0
    for lo, hi in spans:
        assert lo == pos
        pos = hi
    assert pos == 5000
    assert clusters.count.max() <= 256


def test_cluster_aabbs_contain_their_triangles():
    p1, p2, p3 = random_triangles(3000, seed=5)
    built = bvh_mod.build_bvh_numpy(p1, p2, p3)
    clusters = cluster_mod.build_clusters(built, 3000, max_tris=128)
    q = [p[built.order] for p in (p1, p2, p3)]
    for k in range(clusters.num_clusters):
        lo, hi = int(clusters.start[k]), int(clusters.start[k] + clusters.count[k])
        for qq in q:
            seg = qq[lo:hi]
            assert (seg >= clusters.aabb_min[k] - 1e-3).all()
            assert (seg <= clusters.aabb_max[k] + 1e-3).all()


def test_oversized_leaf_chunked():
    p1, p2, p3 = random_triangles(100, seed=6)
    built = bvh_mod.build_bvh_numpy(p1, p2, p3, max_depth=0)  # single leaf
    clusters = cluster_mod.build_clusters(built, 100, max_tris=32)
    assert clusters.num_clusters == 4
    assert clusters.count.sum() == 100


def test_pack_blocks_roundtrip():
    p1, p2, p3 = random_triangles(300, seed=7)
    built = bvh_mod.build_bvh_numpy(p1, p2, p3)
    clusters = cluster_mod.build_clusters(built, 300, max_tris=64)
    q1, q2, q3 = (p[built.order] for p in (p1, p2, p3))
    e1, e2 = q2 - q1, q3 - q1
    blocks, slot_tri = cluster_mod.pack_cluster_blocks(clusters, q1, e1, e2)
    K, C = clusters.num_clusters, 64
    assert blocks.shape == (K, 16, C)
    valid = slot_tri >= 0
    assert valid.sum() == 300
    # Every valid slot's stored components match the source triangle.
    for slot in np.nonzero(valid)[0][:50]:
        k, c = divmod(slot, C)
        tri = slot_tri[slot]
        np.testing.assert_allclose(blocks[k, 0:3, c], q1[tri])
        np.testing.assert_allclose(blocks[k, 3:6, c], e1[tri])
        np.testing.assert_allclose(blocks[k, 6:9, c], e2[tri])


def test_pack_blocks_rejects_giant_scenes():
    """Triangle ids ride a float32 row — exact only below 2^24, and the
    packer must fail loudly at the limit instead of corrupting hit ids."""
    clusters = cluster_mod.ClusterArrays(
        start=np.zeros(1, np.int32),
        count=np.zeros(1, np.int32),
        aabb_min=np.zeros((1, 3), np.float32),
        aabb_max=np.zeros((1, 3), np.float32),
        max_tris=4,
    )
    # Shape-only stand-in: the check fires on the row count before any copy.
    huge = np.broadcast_to(np.zeros(3, np.float32), (1 << 24, 3))
    with pytest.raises(ValueError, match="2\\^24"):
        cluster_mod.pack_cluster_blocks(clusters, huge, huge, huge)


def _scene_with_clusters(
    tri_count=3000, seed=11, cluster_tris=None, config_overrides=None
):
    from cuda_raytracer_tpu.models import cluster as cluster_mod2
    from cuda_raytracer_tpu.models.scene_dsl import assemble_scene, parse_scene_text

    p1, p2, p3 = random_triangles(tri_count, seed=seed, spread=5.0)
    lines = ["material m diffuse 0.5 0.5 0.5"]
    for a, b, c in zip(p1, p2, p3):
        lines.append(
            "triangle m " + " ".join(f"{v:.6f}" for v in np.concatenate([a, b, c]))
        )
    lines.append("camera position 0 0 -20 forward 0 0 1 up 0 1 0 fov 45")
    lines.append("image 8 8 1 3 1")
    return assemble_scene(
        parse_scene_text("\n".join(lines)),
        prefer_native_bvh=False,
        cluster_tris=cluster_tris or cluster_mod2.DEFAULT_CLUSTER_TRIS,
        config_overrides=config_overrides,
    )


@pytest.mark.parametrize("scene_name", ["teapot", "glass_teapot", "lamp"])
def test_no_packet_overflow_on_reference_scenes(scene_name):
    """Primary camera rays must never trip the packet certificate at the
    default per-tile cap on the shipped scenes (the exactness precondition
    for the fast path at render settings)."""
    import warnings

    # True render geometry: the shipped scenes render at 1000×1000, where a
    # 128-ray tile is a 128-pixel row segment. Sample 64 rows spread over the
    # full image, 128-pixel center span each, so every tile has exactly the
    # coherence footprint of a real render tile.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene = load_scene(
            f"{REF}/{scene_name}.scene",
            config_overrides=dict(width=1000, height=1000),
        )
    rows = np.arange(0, 1000, 1000 // 64)[:64]
    cols = np.arange(436, 436 + 128)
    ray_id = jnp.asarray(
        (rows[:, None] * 1000 + cols[None, :]).reshape(-1).astype(np.int32)
    )
    n = ray_id.shape[0]
    origin, direction = camera_ops.generate_rays(
        scene.camera, 1000, 1, ray_id, 0
    )
    t0 = jnp.full((n,), intersect.MISS)
    i0 = jnp.full((n,), -1, jnp.int32)
    _, _, suspects = packet_intersect.closest_hit_packet(
        scene, origin, direction, t0, i0,
        tile=scene.config.packet_tile,
        cap=min(scene.config.packet_cap, scene.num_clusters),
    )
    assert int(suspects) == 0, f"{scene_name}: {int(suspects)} suspect rays"
