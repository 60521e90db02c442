"""PCG-XSH-RR 64/32 random number generator, vectorised for TPU.

Bit-exact JAX reimplementation of the reference's PCG RNG
(reference: random.cuh:5-75): a 64-bit LCG state advanced by
``state = state * 6364136223846793005 + (inc | 1)`` with an
xorshift-high + random-rotate output function. The reference seeds by
multiplying the 32-bit seed with a large odd constant and burning one draw
(random.cuh:25-30).

TPU design: TPUs have no 64-bit integer units and JAX runs with x64 disabled,
so the 64-bit state is carried as a pair of uint32 limbs ``(hi, lo)`` and the
64x64→low-64 multiply is built from 16-bit partial products on the VPU. The
generator is used *counter-style*: every (ray, bounce) derives a fresh seed
from its index, so there is no sequential RNG state threaded through the scan —
each draw chain is at most ~5 steps long. All derived samplers (``random01``,
``random02``, ``random_radians``, ``random_on_sphere``) reproduce the
reference's value mapping exactly (random.cuh:32-75).

Every function is shape-polymorphic: states are pytrees of equal-shaped uint32
arrays, so the same code vectorises over a ray batch of any shape.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

# 6364136223846793005 = 0x5851F42D_4C957F2D  (the PCG default multiplier)
_MULT_HI = np.uint32(0x5851F42D)
_MULT_LO = np.uint32(0x4C957F2D)
# Stream increment 820957824423429 (odd, so `inc | 1 == inc`), random.cuh:28
_INC_HI = np.uint32(0x0002EAA8)
_INC_LO = np.uint32(0x23801605)
# Seeding multiplier 6839056345687307, random.cuh:27
_SEED_MULT_HI = np.uint32(0x00184C15)
_SEED_MULT_LO = np.uint32(0xE415650B)

_U16_MASK = np.uint32(0xFFFF)

# Value scalings (random.cuh:32-45). Computed exactly as float32 constants.
_INV_UINT_MAX = np.float32(1.0) / np.float32(4294967295.0)
_TWO_INV_UINT_MAX = np.float32(2.0) / np.float32(4294967295.0)
_TWO_PI_INV_UINT_MAX = np.float32(2.0 * np.pi) / np.float32(4294967295.0)


class PcgState(NamedTuple):
    """64-bit PCG state as two uint32 limbs (any broadcastable shape)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def _mul32_wide(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full 32x32→64 unsigned multiply via 16-bit limbs; returns (hi, lo)."""
    a0 = a & _U16_MASK
    a1 = a >> 16
    b0 = b & _U16_MASK
    b1 = b >> 16
    p00 = a0 * b0
    # Carry-chain: none of these intermediate sums can overflow uint32
    # because (2^16-1)^2 + 2*(2^16-1) < 2^32.
    mid = a1 * b0 + (p00 >> 16)
    mid2 = a0 * b1 + (mid & _U16_MASK)
    hi = a1 * b1 + (mid >> 16) + (mid2 >> 16)
    lo = (mid2 << 16) | (p00 & _U16_MASK)
    return hi, lo


def _mul64(a_hi, a_lo, b_hi, b_lo) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """64x64→low-64 multiply on uint32 limb pairs."""
    hi, lo = _mul32_wide(a_lo, b_lo)
    hi = hi + a_lo * b_hi + a_hi * b_lo
    return hi, lo


def _add64(a_hi, a_lo, b_hi, b_lo) -> Tuple[jnp.ndarray, jnp.ndarray]:
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(jnp.uint32)
    return a_hi + b_hi + carry, lo


def pcg_advance(state: PcgState) -> PcgState:
    """One LCG step: ``state * MULT + INC`` (random.cuh:17)."""
    hi, lo = _mul64(state.hi, state.lo, _MULT_HI, _MULT_LO)
    hi, lo = _add64(hi, lo, _INC_HI, _INC_LO)
    return PcgState(hi, lo)


def pcg_output(state: PcgState) -> jnp.ndarray:
    """XSH-RR output function of a (pre-advance) state (random.cuh:19-22)."""
    # xorshifted = (uint32)(((state >> 18) ^ state) >> 27)
    t_lo = state.lo ^ ((state.lo >> 18) | (state.hi << 14))
    t_hi = state.hi ^ (state.hi >> 18)
    xorshifted = (t_lo >> 27) | (t_hi << 5)
    rot = state.hi >> 27  # (uint32)(state >> 59)
    # Rotate right by `rot`; ((-rot) & 31) handles rot == 0 exactly like C.
    neg_rot = (jnp.zeros_like(rot) - rot) & np.uint32(31)
    return (xorshifted >> rot) | (xorshifted << neg_rot)


def pcg_next(state: PcgState) -> Tuple[PcgState, jnp.ndarray]:
    """Advance and return (new_state, uint32 draw) — ``xor_rand``."""
    return pcg_advance(state), pcg_output(state)


def srand(seed: jnp.ndarray) -> PcgState:
    """Seed from a uint32 (``xor_srand``, random.cuh:25-30): multiply the
    seed by a large odd constant and burn one draw."""
    seed = _u32(seed)
    hi, lo = _mul32_wide(seed, _SEED_MULT_LO)
    hi = hi + seed * _SEED_MULT_HI
    return pcg_advance(PcgState(hi, lo))


def uniforms(seed: jnp.ndarray, n: int) -> jnp.ndarray:
    """The first ``n`` raw uint32 draws of a freshly seeded generator,
    stacked on a new leading axis: shape ``(n,) + seed.shape``."""
    state = srand(seed)
    outs = []
    for _ in range(n):
        state, value = pcg_next(state)
        outs.append(value)
    return jnp.stack(outs, axis=0)


def to_01(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 → [0, 1] float32, exactly ``bits * (1.0f / UINT_MAX)``."""
    return bits.astype(jnp.float32) * _INV_UINT_MAX


def to_02(bits: jnp.ndarray) -> jnp.ndarray:
    return bits.astype(jnp.float32) * _TWO_INV_UINT_MAX


def to_radians(bits: jnp.ndarray) -> jnp.ndarray:
    return bits.astype(jnp.float32) * _TWO_PI_INV_UINT_MAX


def random01(state: PcgState) -> Tuple[PcgState, jnp.ndarray]:
    state, bits = pcg_next(state)
    return state, to_01(bits)


def on_sphere_from_bits(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """Uniform point on the unit sphere from two raw draws, matching
    ``random_on_sphere`` (random.cuh:63-75): r1 ∈ [0, 2π), r2 ∈ [0, 2],
    z = 1 - r2, ring radius sqrt(r2 * (2 - r2)). Returns (..., 3)."""
    r1 = to_radians(bits_a)
    r2 = to_02(bits_b)
    x = jnp.sqrt(r2 * (2.0 - r2))
    return jnp.stack([jnp.cos(r1) * x, jnp.sin(r1) * x, 1.0 - r2], axis=-1)


def random_on_sphere(state: PcgState) -> Tuple[PcgState, jnp.ndarray]:
    state, a = pcg_next(state)
    state, b = pcg_next(state)
    return state, on_sphere_from_bits(a, b)
