"""Ray-primitive intersection kernels (reference: scene.cu:107-241,338-372).

All kernels are batched over a leading ray axis and vectorised over primitives
— the TPU replaces the reference's per-thread scalar loops with (rays x prims)
tiles on the VPU. Epsilons and acceptance rules match the reference exactly:
hit distance >= 0.005, strict closest-hit comparisons, first index wins ties.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.ops import vecmath

HIT_EPS = np.float32(0.005)
MISS = np.float32(1e30)


def intersect_spheres(
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    center: jnp.ndarray,  # (S, 3)
    radius: jnp.ndarray,  # (S,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest sphere hit per ray, brute force over all spheres — spheres are
    deliberately outside the BVH (scene.cuh:118-123). Quarter-discriminant
    quadratic; tries the near root, then the far root (scene.cu:338-372).

    Returns (t, index): t == MISS and index == -1 when nothing is hit.
    """
    # Component form: (R, 1) × (1, S) broadcasts, no (R, S, 3) stacks.
    offx = center[None, :, 0] - origin[:, 0:1]
    offy = center[None, :, 1] - origin[:, 1:2]
    offz = center[None, :, 2] - origin[:, 2:3]
    minus_half_b = (
        offx * direction[:, 0:1] + offy * direction[:, 1:2] + offz * direction[:, 2:3]
    )
    quarter_c = (
        offx * offx + offy * offy + offz * offz
        - radius[None, :] * radius[None, :]
    )
    quarter_disc = minus_half_b * minus_half_b - quarter_c
    ok = quarter_disc >= 0
    half_sqrt = jnp.sqrt(jnp.maximum(quarter_disc, 0.0))
    near = minus_half_b - half_sqrt
    far = minus_half_b + half_sqrt
    # Reference order: accept near if >= eps, else consider far.
    t = jnp.where(near >= HIT_EPS, near, jnp.where(far >= HIT_EPS, far, MISS))
    t = jnp.where(ok, t, MISS)  # (R, S)
    return _closest(t)


def _closest(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(best_t, index | -1) per row of a (R, N) hit-distance matrix, first
    minimum winning ties like the reference loops. Dense min + equality
    mask — a take_along_axis gather here costs ~2 ms per 262k rays on TPU
    (row gathers run element-wise), dominating small-scene renders."""
    N = t.shape[1]
    best_t = jnp.min(t, axis=1)
    eq = t == best_t[:, None]
    idx = jnp.min(
        jnp.where(eq, jnp.arange(N, dtype=jnp.int32)[None, :], N), axis=1
    )
    index = jnp.where(best_t < MISS, idx, -1)
    return jnp.where(best_t < MISS, best_t, MISS), index.astype(jnp.int32)


def moller_trumbore(
    origin: jnp.ndarray,  # (..., 3)
    direction: jnp.ndarray,  # (..., 3)
    p1: jnp.ndarray,  # (..., 3)
    e1: jnp.ndarray,  # (..., 3)  p2 - p1
    e2: jnp.ndarray,  # (..., 3)  p3 - p1
) -> jnp.ndarray:
    """Möller–Trumbore hit distance for broadcast-matched ray/triangle
    batches; MISS where the ray misses (scene.cu:163-195). Rejects exactly
    like the reference: zero determinant, u outside [0,1], v < 0, u+v > 1,
    t < 0.005."""
    h = vecmath.cross(direction, e2)
    det = vecmath.dot(h, e1)
    inv_det = jnp.where(det == 0, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    offset = origin - p1
    u = vecmath.dot(offset, h) * inv_det
    q = vecmath.cross(offset, e1)
    v = vecmath.dot(direction, q) * inv_det
    t = vecmath.dot(e2, q) * inv_det
    valid = (
        (det != 0)
        & (u >= 0)
        & (u <= 1)
        & (v >= 0)
        & (u + v <= 1)
        & (t >= HIT_EPS)
    )
    return jnp.where(valid, t, MISS)


def intersect_triangles_brute(
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    p1: jnp.ndarray,  # (T, 3)
    e1: jnp.ndarray,  # (T, 3)
    e2: jnp.ndarray,  # (T, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest triangle hit per ray over all triangles as one (R, T) tile.
    Semantically equal to traversing a single-leaf BVH (the reference's
    no_bvh mode). Returns (t, triangle_index | -1).

    Component form — per-axis (R, 1) × (1, T) broadcasts instead of
    (R, T, 3) vector stacks, which XLA materialises per dot product
    (measured ~8 ms per 262k-ray tile on 32 triangles vs sub-ms fused)."""
    ox = origin[:, 0:1]
    oy = origin[:, 1:2]
    oz = origin[:, 2:3]
    dx = direction[:, 0:1]
    dy = direction[:, 1:2]
    dz = direction[:, 2:3]
    p1x, p1y, p1z = p1[None, :, 0], p1[None, :, 1], p1[None, :, 2]
    e1x, e1y, e1z = e1[None, :, 0], e1[None, :, 1], e1[None, :, 2]
    e2x, e2y, e2z = e2[None, :, 0], e2[None, :, 1], e2[None, :, 2]
    # h = d × e2
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = hx * e1x + hy * e1y + hz * e1z
    inv_det = jnp.where(det == 0, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    fx = ox - p1x
    fy = oy - p1y
    fz = oz - p1z
    u = (fx * hx + fy * hy + fz * hz) * inv_det
    # q = f × e1
    qx = fy * e1z - fz * e1y
    qy = fz * e1x - fx * e1z
    qz = fx * e1y - fy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (
        (det != 0) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        & (t >= HIT_EPS)
    )
    return _closest(jnp.where(valid, t, MISS))


def ray_aabb(
    origin: jnp.ndarray,  # (..., 3)
    inv_direction: jnp.ndarray,  # (..., 3)
    box_min: jnp.ndarray,  # (..., 3)
    box_max: jnp.ndarray,  # (..., 3)
    tmax: jnp.ndarray,  # (...)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless Tavian slab test (scene.cu:107-132): per-axis near/far via
    hardware min/max, entry time floored at 0. Returns (hit, tmin)."""
    t1 = (box_min - origin) * inv_direction
    t2 = (box_max - origin) * inv_direction
    tmin = jnp.zeros_like(tmax)
    for axis in range(3):
        a = t1[..., axis]
        b = t2[..., axis]
        tmin = jnp.minimum(jnp.maximum(a, tmin), jnp.maximum(b, tmin))
        tmax = jnp.maximum(jnp.minimum(a, tmax), jnp.minimum(b, tmax))
    return tmin <= tmax, tmin
