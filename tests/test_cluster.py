"""Cluster build + clustered intersector tests.

The clustered path must agree with brute force exactly (same closest
distances; indices may differ only on distance ties) — the same A/B
acceptance as BVH-vs-brute, applied to the TPU-native structure.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_raytracer_tpu.models import bvh as bvh_mod
from cuda_raytracer_tpu.models import cluster as cluster_mod
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops import cluster_intersect, intersect

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


def _scene_with_clusters(tri_count=3000, seed=11):
    from cuda_raytracer_tpu.models.scene_dsl import assemble_scene, parse_scene_text

    p1, p2, p3 = random_triangles(tri_count, seed=seed, spread=5.0)
    lines = ["material m diffuse 0.5 0.5 0.5"]
    for a, b, c in zip(p1, p2, p3):
        lines.append(
            "triangle m " + " ".join(f"{v:.6f}" for v in np.concatenate([a, b, c]))
        )
    lines.append("camera position 0 0 -20 forward 0 0 1 up 0 1 0 fov 45")
    lines.append("image 8 8 1 3 1")
    return assemble_scene(parse_scene_text("\n".join(lines)), prefer_native_bvh=False)


def _compare_with_brute(scene, n_rays=512, seed=0, h_budget=32):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.bvh_min[0])
    hi = np.asarray(scene.bvh_max[0])
    origin = jnp.asarray(rng.uniform(lo - 1, hi + 1, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    direction = jnp.asarray(d)

    t0 = jnp.full((n_rays,), intersect.MISS)
    i0 = jnp.full((n_rays,), -1, jnp.int32)
    t_cl, i_cl, overflow = cluster_intersect.closest_hit_clustered(
        scene, origin, direction, t0, i0, h_budget=h_budget
    )
    assert int(overflow) == 0, f"H overflow on {int(overflow)} rays"
    t_br, i_br = intersect.intersect_triangles_brute(
        origin, direction, scene.tri_p1, scene.tri_e1, scene.tri_e2
    )
    i_br = jnp.where(i_br >= 0, scene.sphere_count + i_br, i_br)
    np.testing.assert_allclose(
        np.asarray(t_cl), np.asarray(t_br), rtol=1e-5, atol=1e-5
    )
    mismatch = (np.asarray(i_cl) != np.asarray(i_br)).mean()
    assert mismatch < 0.01  # ties only


def test_clustered_matches_brute_random_cloud():
    _compare_with_brute(_scene_with_clusters())


def test_clustered_matches_brute_teapot_sample():
    scene = load_scene(
        f"{REF}/teapot.scene",
        config_overrides=dict(width=8, height=8),
    )
    assert scene.num_clusters > 100
    _compare_with_brute(scene, n_rays=256, h_budget=32)


@pytest.mark.parametrize("scene_name", ["teapot", "glass_teapot", "lamp"])
def test_no_h_overflow_on_reference_scenes(scene_name):
    """Primary camera rays must never overflow the default H budget on the
    shipped scenes (the exactness precondition for the clustered path)."""
    import warnings

    from cuda_raytracer_tpu.ops import camera as camera_ops

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene = load_scene(
            f"{REF}/{scene_name}.scene",
            config_overrides=dict(width=32, height=32),
        )
    ray_id = jnp.arange(32 * 32, dtype=jnp.int32)
    origin, direction = camera_ops.generate_rays(
        scene.camera, 32, 1, ray_id, 0
    )
    t0 = jnp.full((1024,), intersect.MISS)
    i0 = jnp.full((1024,), -1, jnp.int32)
    _, _, overflow = cluster_intersect.closest_hit_clustered(
        scene, origin, direction, t0, i0, h_budget=scene.config.cluster_h
    )
    assert int(overflow) == 0, f"{scene_name}: {int(overflow)} rays overflow H"
