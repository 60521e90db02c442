"""BVH builder invariants + traversal-vs-brute-force equivalence.

The traversal equivalence test is the framework's version of the reference's
own `no_bvh` A/B harness (SURVEY §4.3): a BVH walk must find exactly the same
closest hits as a linear scan over all triangles.
"""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.models import bvh as bvh_mod
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops import intersect, traverse

REF = "/root/reference"


def random_triangles(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    p1 = base
    p2 = base + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    p3 = base + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return p1, p2, p3


def test_invariants_random():
    p1, p2, p3 = random_triangles(500)
    built = bvh_mod.build_bvh_numpy(p1, p2, p3)
    assert bvh_mod.validate_bvh(built, 500) is None
    assert built.max_leaf_size >= 1
    # A 500-triangle cloud must actually split.
    assert built.child1.shape[0] > 1


def test_no_bvh_is_single_leaf():
    p1, p2, p3 = random_triangles(100)
    built = bvh_mod.build_bvh_numpy(p1, p2, p3, max_depth=0)
    assert built.child1.shape[0] == 1
    assert built.child2[0] == 0 and built.child1[0] == 100  # leaf [0, 100)
    assert built.max_leaf_size == 100


def test_leaf_target_honoured():
    p1, p2, p3 = random_triangles(2000, seed=3)
    built = bvh_mod.build_bvh_numpy(p1, p2, p3)
    leaf = built.child2 <= built.child1
    sizes = built.child1[leaf] - built.child2[leaf]
    # Non-degenerate random cloud: every leaf should be small.
    assert sizes.max() <= 8


def test_aabbs_contain_triangles():
    p1, p2, p3 = random_triangles(300, seed=1)
    built = bvh_mod.build_bvh_numpy(p1, p2, p3)
    q1, q2, q3 = p1[built.order], p2[built.order], p3[built.order]
    for node in range(built.child1.shape[0]):
        if built.child2[node] <= built.child1[node]:
            lo, hi = built.child2[node], built.child1[node]
            for q in (q1, q2, q3):
                seg = q[lo:hi]
                if len(seg) == 0:
                    continue
                assert (seg >= built.node_min[node] - 1e-3).all()
                assert (seg <= built.node_max[node] + 1e-3).all()


def _traversal_vs_brute(scene, n_rays=256, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.bvh_min[0])
    hi = np.asarray(scene.bvh_max[0])
    origin = jnp.asarray(
        rng.uniform(lo - 1, hi + 1, (n_rays, 3)).astype(np.float32)
    )
    direction = rng.normal(size=(n_rays, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    direction = jnp.asarray(direction)

    t0 = jnp.full((n_rays,), intersect.MISS)
    i0 = jnp.full((n_rays,), -1, jnp.int32)
    t_bvh, i_bvh = traverse.bvh_closest_hit(scene, origin, direction, t0, i0)
    t_brute, i_brute = intersect.intersect_triangles_brute(
        origin, direction, scene.tri_p1, scene.tri_e1, scene.tri_e2
    )
    i_brute = jnp.where(i_brute >= 0, scene.sphere_count + i_brute, i_brute)
    np.testing.assert_allclose(
        np.asarray(t_bvh), np.asarray(t_brute), rtol=1e-5, atol=1e-5
    )
    hit_match = np.asarray(i_bvh) == np.asarray(i_brute)
    # Indices may differ only where two triangles tie on distance.
    mismatched = ~hit_match
    assert mismatched.mean() < 0.01


def test_traversal_matches_brute_cornell():
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(width=8, height=8),
        prefer_native_bvh=False,
    )
    _traversal_vs_brute(scene)


def test_traversal_matches_brute_random_cloud():
    from cuda_raytracer_tpu.models.scene_dsl import assemble_scene, parse_scene_text

    p1, p2, p3 = random_triangles(700, seed=7, spread=5.0)
    lines = ["material m diffuse 0.5 0.5 0.5"]
    for a, b, c in zip(p1, p2, p3):
        lines.append(
            "triangle m "
            + " ".join(f"{v:.6f}" for v in np.concatenate([a, b, c]))
        )
    lines.append("camera position 0 0 -20 forward 0 0 1 up 0 1 0 fov 45")
    lines.append("image 8 8 1 3 1")
    scene = assemble_scene(parse_scene_text("\n".join(lines)), prefer_native_bvh=False)
    assert scene.bvh_node_count > 1
    _traversal_vs_brute(scene, n_rays=512)


def test_traversal_tiling_matches_single_tile():
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(width=8, height=8),
        prefer_native_bvh=False,
    )
    rng = np.random.default_rng(2)
    n = 100  # deliberately not a multiple of the tile size
    origin = jnp.asarray(rng.uniform(-500, 500, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    direction = jnp.asarray(d)
    t0 = jnp.full((n,), intersect.MISS)
    i0 = jnp.full((n,), -1, jnp.int32)
    t_a, i_a = traverse.bvh_closest_hit(scene, origin, direction, t0, i0)
    t_b, i_b = traverse.bvh_closest_hit(
        scene, origin, direction, t0, i0, tile_size=32
    )
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
