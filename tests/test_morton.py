"""Morton key tests (correct interleave — divergence from reference quirk Q1)."""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.ops import morton


def spread_reference(x: int) -> int:
    """Straightforward bit-by-bit spread for cross-checking."""
    out = 0
    for bit in range(5):
        out |= ((x >> bit) & 1) << (3 * bit)
    return out


def test_interleave_5_matches_bitwise_spread():
    xs = jnp.asarray(np.arange(32, dtype=np.uint32))
    ours = np.asarray(morton.interleave_5(xs))
    for x in range(32):
        assert int(ours[x]) == spread_reference(x), x


def test_morton_code_order():
    # Nearby points share high bits; quantisation matches (ushort)(v * 31.99).
    v = jnp.asarray(np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32))
    codes = np.asarray(morton.morton_code(v))
    assert codes[0] == 0
    assert codes[1] == 0x7FFF  # all 15 bits set


def test_dead_rays_key_last():
    origin = jnp.zeros((4, 3))
    direction = jnp.zeros((4, 3))
    alive = jnp.asarray([True, False, True, False])
    keys = np.asarray(
        morton.ray_sort_keys(
            origin, direction, alive, jnp.zeros(3), jnp.ones(3)
        )
    )
    assert (keys[[1, 3]] == 0xFFFFFFFF).all()
    assert (keys[[0, 2]] != 0xFFFFFFFF).all()


def _slab_oracle(o, d, bmin, bmax):
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    t1 = (bmin[None] - o[:, None]) * inv[:, None]
    t2 = (bmax[None] - o[:, None]) * inv[:, None]
    near = np.maximum(np.minimum(t1, t2).max(axis=2), 0.0)
    far = np.maximum(t1, t2).min(axis=2)
    return near <= far


def test_first2_cluster_keys_oracle():
    """fh/sh in the packed key match a scalar first/second-hit oracle,
    across chunk boundaries (K > _FIRST2_CHUNK) and with dead rays last."""
    rng = np.random.default_rng(7)
    R, K = 512, morton._FIRST2_CHUNK + 37
    o = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    centers = rng.uniform(-3, 3, (K, 3)).astype(np.float32)
    half = rng.uniform(0.05, 0.8, (K, 3)).astype(np.float32)
    bmin, bmax = centers - half, centers + half
    alive = rng.uniform(size=R) < 0.9

    keys = np.asarray(
        morton.first2_cluster_keys(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(alive),
            jnp.asarray(bmin), jnp.asarray(bmax), K, 1,
        )
    )
    # float32 oracle: float64 slab would flip grazing hits vs the kernel
    hit = _slab_oracle(o, d, bmin, bmax)
    idx = np.where(hit, np.arange(K)[None], K)
    fh = idx.min(axis=1)
    sh = np.where(idx == fh[:, None], K, idx).min(axis=1)
    assert K + 1 <= 2048  # this K keeps indices exact in the 11-bit fields
    want = (fh.astype(np.uint32) << 21) | (sh.astype(np.uint32) << 10)
    want = np.where(alive, want, np.uint32(0xFFFFFFFF))
    np.testing.assert_array_equal(keys, want)
    # dead rays sort strictly last (live-prefix compaction depends on it)
    order = np.argsort(keys, kind="stable")
    a_sorted = alive[order]
    assert a_sorted[: alive.sum()].all()
    assert (~a_sorted[alive.sum():]).all()


def test_first2_cluster_keys_scaled_and_split():
    """K+1 > 2048 engages the 11-bit squeeze monotonically; cull_split > 1
    maps sub-box rows down to distinct cluster ids."""
    rng = np.random.default_rng(3)
    R, K, S = 128, 3000, 2
    o = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    centers = rng.uniform(-3, 3, (K * S, 3)).astype(np.float32)
    half = rng.uniform(0.05, 0.5, (K * S, 3)).astype(np.float32)
    bmin, bmax = centers - half, centers + half
    alive = np.ones(R, bool)
    keys = np.asarray(
        morton.first2_cluster_keys(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(alive),
            jnp.asarray(bmin), jnp.asarray(bmax), K, S,
        )
    )
    hit = _slab_oracle(o, d, bmin, bmax)
    ids = np.arange(K * S) // S
    idx = np.where(hit, ids[None], K)
    fh = idx.min(axis=1)
    sh = np.where(idx == fh[:, None], K, idx).min(axis=1)
    want = ((fh * 2047 // K).astype(np.uint32) << 21) | (
        (sh * 2047 // K).astype(np.uint32) << 10
    )
    np.testing.assert_array_equal(keys, want)
    # sentinel stays the strict maximum after scaling
    assert (3000 * 2047) // 3000 == 2047
