"""Vector math on ``(..., 3)`` float32 arrays.

TPU-native counterpart of the reference's ``Vec3`` struct library
(reference: math.cuh:11-143). Instead of an AoS 3-vector type, every helper
operates on the trailing axis of SoA arrays so a batch of N rays is an
``(N, 3)`` array that XLA lays out across VPU lanes.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Inner product over the trailing axis. (math.cuh dot)"""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3D cross product over the trailing axis. (math.cuh cross)"""
    return jnp.cross(a, b)


def magnitude_squared(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def magnitude(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(magnitude_squared(a))


def normalise(a: jnp.ndarray) -> jnp.ndarray:
    """Unit vector; matches the reference's unguarded 1/|v| semantics
    (math.cuh normalise): a zero vector yields inf/nan rather than being
    silently fixed — callers are responsible, as in the reference."""
    return a / magnitude(a)[..., None]


def normalise_safe(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Gradient-safe normalise: clamps |v| away from 0 so backward passes
    through degenerate directions produce finite gradients."""
    return a / jnp.maximum(magnitude(a), eps)[..., None]


def clamp01(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(a, 0.0, 1.0)


def lerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    return a + (b - a) * t


def reflect(direction: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Mirror ``direction`` about ``normal`` (scene.cu:435 formula,
    written with the reference's cos_theta = dot(n, d) sign convention)."""
    return direction - 2.0 * dot(normal, direction)[..., None] * normal
