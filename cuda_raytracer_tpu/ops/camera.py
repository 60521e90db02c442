"""Primary-ray generation (reference: scene.cu:78-105).

One vectorised call produces the whole wavefront: ray ``i`` belongs to pixel
``i // rays_per_pixel`` (pixel-major layout, so accumulation is a static
reshape-and-sum and contiguous ray shards map to contiguous pixel spans for
SPMD). Jitter comes from the per-ray PCG stream seeded exactly like the
reference: ``ray_index * 298592570346 + 709579 * seed`` truncated to uint32
(scene.cu:81).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.models.scene import Camera
from cuda_raytracer_tpu.ops import rng, vecmath

# 298592570346 mod 2^32 (the 64-bit literal is multiplied into a uint32 seed).
_RAY_SEED_MULT = np.uint32(2239826922)
_PASS_SEED_MULT = np.uint32(709579)


def initial_ray_seeds(ray_index: jnp.ndarray, pass_seed) -> jnp.ndarray:
    return (
        ray_index.astype(jnp.uint32) * _RAY_SEED_MULT
        + _PASS_SEED_MULT * jnp.uint32(pass_seed)
    )


def generate_rays(
    camera: Camera,
    width: int,
    rays_per_pixel: int,
    ray_index: jnp.ndarray,  # (R,) int32 — global ray indices
    pass_seed,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera rays for the given global ray indices.

    Returns (origin (R,3), direction (R,3)). Matches the reference mapping:
    pixel = index // rpp, jittered across the pixel footprint with two
    uniform draws, direction = normalise(top_left + x·right_scaled −
    y·up_scaled)."""
    pixel = ray_index // rays_per_pixel
    px = (pixel % width).astype(jnp.float32)
    py = (pixel // width).astype(jnp.float32)

    draws = rng.uniforms(initial_ray_seeds(ray_index, pass_seed), 2)
    jitter_x = rng.to_01(draws[0])
    jitter_y = rng.to_01(draws[1])

    x = (px + jitter_x) * camera.inv_width
    y = (py + jitter_y) * camera.inv_height

    direction = vecmath.normalise(
        camera.near_plane_top_left[None, :]
        + x[:, None] * camera.scaled_right[None, :]
        - y[:, None] * camera.scaled_up[None, :]
    )
    origin = jnp.broadcast_to(camera.position[None, :], direction.shape)
    return origin, direction
