"""Environment-map sampling on miss (reference: scene.cu:281-395).

Pipeline per missed ray: apply the reference's hardcoded orientation transform
(its test maps are rotated with y/z swapped, scene.cu:378-382), equal-area
octahedral sphere→square projection (PBRTv4 port, scene.cu:284-318), then
nearest-neighbour texel fetch.

Divergence from the reference (quirk Q2): the reference indexes the map with
``y * height + x`` (scene.cu:391), which is only correct for square maps; we
index ``y * width + x``. Identical results for every shipped (square) asset.

The sampled radiance is differentiable w.r.t. the map — the sky is one of the
north-star gradient targets.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.ops import vecmath

# Rotation constants from scene.cu:380-382.
_ROT_A = np.float32(-0.386527)
_ROT_B = np.float32(0.922278)


def rotate_to_map_space(direction: jnp.ndarray) -> jnp.ndarray:
    """The reference's hardcoded env-map orientation fix: y/z swap plus a
    rotation about the new z axis (scene.cu:378-382)."""
    dx = direction[..., 0] * _ROT_A + direction[..., 2] * _ROT_B
    dy = direction[..., 0] * -_ROT_B + direction[..., 2] * _ROT_A
    dz = direction[..., 1]
    return jnp.stack([dx, dy, dz], axis=-1)


def equal_area_sphere_to_square(direction: jnp.ndarray) -> jnp.ndarray:
    """Equal-area octahedral projection of unit directions to [0,1]^2
    (scene.cu:284-318). Fully branchless: every reference `if` becomes a
    select, so the whole batch vectorises on the VPU. Returns (..., 2) u,v."""
    x = jnp.abs(direction[..., 0])
    y = jnp.abs(direction[..., 1])
    z = jnp.abs(direction[..., 2])

    r = jnp.sqrt(jnp.maximum(1.0 - jnp.minimum(z, 1.0), 0.0))
    a = jnp.maximum(x, y)
    b = jnp.minimum(x, y)
    b = jnp.where(a == 0, 0.0, b / jnp.where(a == 0, 1.0, a))

    phi = np.float32(2.0 / np.pi) * jnp.arctan(b)
    phi = jnp.where(x < y, 1.0 - phi, phi)

    v = phi * r
    u = r - v

    # Southern hemisphere: reflect across the diagonal (scene.cu:307-312).
    south = direction[..., 2] < 0
    u_s = 1.0 - v
    v_s = 1.0 - u
    u = jnp.where(south, u_s, u)
    v = jnp.where(south, v_s, v)

    u = jnp.copysign(u, direction[..., 0])
    v = jnp.copysign(v, direction[..., 1])
    return jnp.stack([(u + 1.0) * 0.5, (v + 1.0) * 0.5], axis=-1)


def sample_environment(
    env_map: jnp.ndarray, direction: jnp.ndarray, bilinear: bool = False
) -> jnp.ndarray:
    """Radiance from the environment for (..., 3) unit directions.

    ``bilinear=False`` (default): nearest-neighbour fetch with the reference's
    rounding ``(int)(clamp01(c) * (dim - 1) + 0.5)`` (scene.cu:389-391) —
    render parity mode. Piecewise-constant in direction, so directions carry
    no gradient.

    ``bilinear=True``: 4-tap bilinear filtering — used by reparameterised
    differentiation (render/diff.py), where pathwise roughness/ior gradients
    need the sky to vary smoothly with the scatter direction.
    """
    height, width = env_map.shape[0], env_map.shape[1]
    if height * width == 1:
        # Constant sky (the `sky r g b` DSL command, scene.cu:597-608):
        # broadcast instead of gathering a 1-texel table per ray.
        return jnp.broadcast_to(
            env_map.reshape(3), direction.shape[:-1] + (3,)
        )
    uv = equal_area_sphere_to_square(rotate_to_map_space(direction))
    flat = env_map.reshape(-1, 3)
    if not bilinear:
        texel_x = (vecmath.clamp01(uv[..., 0]) * (width - 1) + 0.5).astype(jnp.int32)
        texel_y = (vecmath.clamp01(uv[..., 1]) * (height - 1) + 0.5).astype(jnp.int32)
        texel_x = jnp.clip(texel_x, 0, width - 1)
        texel_y = jnp.clip(texel_y, 0, height - 1)
        return flat[texel_y * width + texel_x]

    fx = vecmath.clamp01(uv[..., 0]) * (width - 1)
    fy = vecmath.clamp01(uv[..., 1]) * (height - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, width - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, height - 1)
    x1 = jnp.minimum(x0 + 1, width - 1)
    y1 = jnp.minimum(y0 + 1, height - 1)
    wx = (fx - x0.astype(jnp.float32))[..., None]
    wy = (fy - y0.astype(jnp.float32))[..., None]
    c00 = flat[y0 * width + x0]
    c01 = flat[y0 * width + x1]
    c10 = flat[y1 * width + x0]
    c11 = flat[y1 * width + x1]
    top = c00 * (1 - wx) + c01 * wx
    bottom = c10 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bottom * wy
