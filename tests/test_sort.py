"""Counting-sort engine tests (ops/sort.py + reorder_rays sort_engine)."""

import numpy as np
import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.ops import sort as sort_mod
from cuda_raytracer_tpu.ops.morton import DEAD_RAY_KEY


def _check_dest(keys, dest):
    n = keys.shape[0]
    dest = np.asarray(dest)
    # A permutation of [0, n).
    assert sorted(dest.tolist()) == list(range(n))
    buckets = np.where(
        keys == DEAD_RAY_KEY,
        sort_mod.BUCKETS - 1,
        np.minimum(keys >> sort_mod.BUCKET_SHIFT, sort_mod.BUCKETS - 2),
    ).astype(np.int64)
    out = np.empty(n, np.int64)
    out[dest] = buckets
    # Buckets ascend; dead rays strictly last.
    assert (np.diff(out) >= 0).all()
    # Stability: equal buckets keep source order <=> dest ascends within
    # each bucket's source positions.
    for b in np.unique(buckets):
        assert (np.diff(dest[buckets == b]) > 0).all()


def test_bucket_sort_dest_random():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 31, size=2048, dtype=np.uint32)
    keys[rng.random(2048) < 0.3] = DEAD_RAY_KEY
    _check_dest(keys, sort_mod.bucket_sort_dest(jnp.asarray(keys)))


def test_bucket_sort_dest_unaligned_and_edge():
    rng = np.random.default_rng(4)
    # n not a multiple of BLK; all-dead and all-one-bucket edge cases.
    keys = rng.integers(0, 1 << 31, size=777, dtype=np.uint32)
    keys[:50] = DEAD_RAY_KEY
    keys[50:99] = np.uint32(0x7FFF0000)  # corner-of-scene live keys
    _check_dest(keys, sort_mod.bucket_sort_dest(jnp.asarray(keys)))
    dead = np.full(300, DEAD_RAY_KEY, np.uint32)
    _check_dest(dead, sort_mod.bucket_sort_dest(jnp.asarray(dead)))


def test_render_count_sort_bit_identical():
    """Any reorder permutation must render bit-identically (RNG is keyed by
    ray id; the unsort restores ray order): count engine == argsort engine
    == no sort."""
    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.render import pipeline

    def render(**cfg):
        scene = load_scene(
            "/root/reference/cornell.scene",
            config_overrides=dict(width=24, height=24, rays_per_pixel=4,
                                  bounces=4, **cfg),
        )
        return np.asarray(pipeline.render_framebuffer(scene))

    base = render(sort_rays=True)
    count = render(sort_rays=True, sort_engine="count")
    nosort = render(sort_rays=False)
    np.testing.assert_array_equal(base, count)
    np.testing.assert_array_equal(base, nosort)


def test_count_sort_grads_match():
    """Gradients through the scatter-applied permutation agree with the
    argsort path (same math, different permutation plumbing)."""
    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.render import diff

    def grad_for(engine):
        scene = load_scene(
            "/root/reference/cornell.scene",
            config_overrides=dict(width=16, height=16, rays_per_pixel=2,
                                  bounces=3, sort_engine=engine),
        )
        params, _ = diff.split_params(scene)
        target = jnp.zeros((scene.num_pixels, 3), jnp.float32)
        loss, g = jax.value_and_grad(
            lambda p: diff.loss_against_target(
                p, scene, target, jnp.uint32(0), 2, 3
            )
        )(params)
        return float(loss), g

    l_a, g_a = grad_for("argsort")
    l_c, g_c = grad_for("count")
    assert l_a == l_c
    leaves_a, treedef_a = jax.tree_util.tree_flatten(g_a)
    leaves_c, treedef_c = jax.tree_util.tree_flatten(g_c)
    assert treedef_a == treedef_c
    for va, vc in zip(leaves_a, leaves_c):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vc), rtol=1e-5, atol=1e-6
        )


def test_unsort_vjp_offset_blocks():
    """_unsort_by_ray_id's custom VJP must match XLA autodiff of the plain
    permutation gather even for non-zero-based ray ids (the blocked render
    path builds ids as block_lo + arange)."""
    from cuda_raytracer_tpu.render import wavefront

    rng = np.random.default_rng(7)
    for R, base in ((64, 0), (64, 4096), (8192 * 2, 131072)):
        cs = wavefront.sort_chunk_size(R)
        nc = R // cs
        # Chunk-local permutation of [base + c*cs, base + (c+1)*cs).
        ids = np.concatenate([
            base + c * cs + rng.permutation(cs) for c in range(nc)
        ]).astype(np.int32)
        collected = rng.normal(size=(R, 3)).astype(np.float32)
        g = rng.normal(size=(R, 3)).astype(np.float32)

        def custom(x):
            return wavefront._unsort_by_ray_id(x, jnp.asarray(ids))

        def reference(x):
            return x[jnp.argsort(jnp.asarray(ids))]

        out_c, vjp_c = jax.vjp(custom, jnp.asarray(collected))
        out_r, vjp_r = jax.vjp(reference, jnp.asarray(collected))
        np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_r))
        np.testing.assert_array_equal(
            np.asarray(vjp_c(jnp.asarray(g))[0]),
            np.asarray(vjp_r(jnp.asarray(g))[0]),
        )


def test_bucket_sort_rejects_oversize():
    """The f32 rank arithmetic is exact only below 2^24 — oversize inputs
    must fail loudly, not silently drop rays in the reorder scatter."""
    import pytest

    keys = jnp.zeros((1 << 24,), jnp.uint32)
    with pytest.raises(ValueError, match="2\\^24"):
        sort_mod.bucket_sort_dest(keys)
