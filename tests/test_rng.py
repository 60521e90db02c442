"""PCG RNG: bit-exact parity with the reference algorithm + distribution checks."""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.ops import rng

from oracle import PcgOracle


def test_pcg_bit_exact_vs_oracle():
    seeds = np.array(
        [0, 1, 2, 42, 123456789, 0xFFFFFFFF, 0xDEADBEEF, 298592570], np.uint32
    )
    ours = np.asarray(rng.uniforms(jnp.asarray(seeds), 8))
    for col, seed in enumerate(seeds):
        oracle = PcgOracle(int(seed))
        for row in range(8):
            expected = oracle.next32()
            assert int(ours[row, col]) == expected, (seed, row)


def test_uniform01_range_and_moments():
    draws = rng.to_01(rng.uniforms(jnp.arange(50000, dtype=jnp.uint32), 2))
    u = np.asarray(draws).ravel()
    assert u.min() >= 0.0 and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.std() - np.sqrt(1 / 12)) < 5e-3


def test_on_sphere_is_uniform_unit():
    seeds = jnp.arange(20000, dtype=jnp.uint32)
    draws = rng.uniforms(seeds, 2)
    v = np.asarray(rng.on_sphere_from_bits(draws[0], draws[1]))
    norms = np.linalg.norm(v, axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # Uniform on S²: each coordinate has mean 0, variance 1/3.
    assert np.abs(v.mean(axis=0)).max() < 0.02
    assert np.abs(v.var(axis=0) - 1 / 3).max() < 0.01


def test_matches_reference_value_scalings():
    # random01 multiplies by 1/UINT_MAX as float32 (random.cuh:32-35).
    bits = jnp.asarray(np.array([0, 0xFFFFFFFF, 0x80000000], np.uint32))
    u = np.asarray(rng.to_01(bits))
    assert u[0] == 0.0
    assert abs(u[1] - 1.0) < 1e-6
    assert abs(u[2] - 0.5) < 1e-6
