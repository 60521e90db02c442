"""Exposure, tonemap and sRGB conversion (reference: raytracing.cu:286-303).

``pixel = (exposure / rays_per_pixel) * accumulated``, HDR→SDR via
``x / (x + 1)``, approximate sRGB via sqrt, scaled by 255.999 to bytes.
Differentiable up to the final byte quantisation (losses should be taken on
``tonemap`` output, not ``to_bytes``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def tonemap(accumulated: jnp.ndarray, exposure: float, rays_per_pixel: int) -> jnp.ndarray:
    """Raw accumulated radiance sums (..., 3) → display-linear [0, 1]."""
    pixel = (np.float32(exposure) / np.float32(rays_per_pixel)) * accumulated
    pixel = jnp.maximum(pixel, 0.0)
    return jnp.sqrt(pixel / (pixel + 1.0))


def to_bytes(display: jnp.ndarray) -> jnp.ndarray:
    return (display * np.float32(255.999)).astype(jnp.uint8)
