"""Morton (Z-order) sort keys for wavefront ray reordering.

TPU equivalent of the reference's ray-coherence keys (scene.cu:42-60,480-485):
5 bits per axis for origin and direction, interleaved into 15-bit codes, packed
as ``origin_code << 16 | direction_code`` in a 32-bit key. Dead rays get key
0xFFFFFFFF so an ascending sort groups them at the tail (scene.cu:480-484).

Divergences from the reference (deliberate, quality-only — SURVEY.md quirks):
  * Q1: the reference's middle interleave mask is the hex literal
    0x1000010100011 that was clearly meant as binary (scene.cu:47), which
    zeroes most key bits. We implement the correct 3-way bit spread
    (masks 0x100F / 0x10C3 / 0x1249).
  * Q5: the reference normalises origins by 1/max_coord instead of
    1/(max-min) (scene.cu:830). We use the correct extent normalisation.
Both bugs only degrade sort quality, never correctness; images are unaffected.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.ops import vecmath

DEAD_RAY_KEY = np.uint32(0xFFFFFFFF)


def interleave_5(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 5 bits of ``x`` to every 3rd bit: 0bABCDE →
    0b A00B00C00D00E. Input/output uint32."""
    x = x & np.uint32(0x1F)
    x = (x | (x << 8)) & np.uint32(0x100F)
    x = (x | (x << 4)) & np.uint32(0x10C3)
    x = (x | (x << 2)) & np.uint32(0x1249)
    return x


def morton_code(v: jnp.ndarray) -> jnp.ndarray:
    """15-bit Morton code of points ``v`` in [0, 1]^3, shape (..., 3) →
    (...,) uint32. Matches the reference quantisation ``(ushort)(x * 31.99)``
    (scene.cu:53-60)."""
    q = (v * np.float32(31.99)).astype(jnp.uint32)
    return (
        interleave_5(q[..., 0])
        | (interleave_5(q[..., 1]) << 1)
        | (interleave_5(q[..., 2]) << 2)
    )


def ray_sort_keys(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    alive: jnp.ndarray,
    min_coord: jnp.ndarray,
    inv_extent: jnp.ndarray,
) -> jnp.ndarray:
    """32-bit coherence keys for a ray batch (scene.cu:484 semantics):
    high half = Morton code of the normalised origin, low half = Morton code
    of the direction mapped from [-1,1] to [0,1]. Dead rays → 0xFFFFFFFF.

    Key-layout note (measured on teapot, v5e): adaptive live-wavefront
    origin bounds and direction-major layouts were both tried and LOSE
    (fwd+bwd step 130 → 147 / 179 ms) — finer origin sorting scatters
    directions within ray tiles, growing each tile's hit-cluster union.
    The reference layout with static scene bounds stays."""
    origin_unit = vecmath.clamp01((origin - min_coord) * inv_extent)
    dir_unit = 0.5 * (direction + 1.0)
    keys = (morton_code(origin_unit) << 16) | morton_code(dir_unit)
    return jnp.where(alive, keys, DEAD_RAY_KEY)
