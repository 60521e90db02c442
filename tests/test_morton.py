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
