"""Bloom post-process (reference: raytracing.cu:21-74,356-392).

Runs on the *raw accumulated* framebuffer before exposure/tonemap, exactly
like the reference (quirk Q7): high-pass keeps pixels whose Rec.709 luminance
exceeds ``0.7 * rays_per_pixel``, a separable radius-5 box blur (edge-clamped
divisor) smears them, and the result is added back. Pure XLA — the reference's
four CUDA kernels collapse into a handful of fused elementwise/reduce-window
ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

REC709_LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)
DEFAULT_RADIUS = 5
THRESHOLD_SCALE = 0.7


def high_pass(image: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Keep pixels with perceived luminance above ``threshold``
    (raytracing.cu:21-31)."""
    luminance = jnp.einsum("hwc,c->hw", image, jnp.asarray(REC709_LUMA))
    return jnp.where((luminance > threshold)[..., None], image, 0.0)


def _box_blur_axis(image: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """1D box blur along ``axis`` with the reference's edge handling: the
    divisor is the number of in-bounds taps (raytracing.cu:33-67)."""
    total = jnp.zeros_like(image)
    count = jnp.zeros(image.shape[:2], image.dtype)
    ones = jnp.ones(image.shape[:2], image.dtype)
    size = image.shape[axis]
    for offset in range(-radius, radius + 1):
        # shifted[x] = image[x + offset]; tap is valid while x+offset stays
        # in bounds, and only valid taps contribute to sum and divisor.
        shifted = jnp.roll(image, shift=-offset, axis=axis)
        valid_lo = max(0, -offset)
        valid_hi = size - max(0, offset)
        idx = jnp.arange(size)
        valid = (idx >= valid_lo) & (idx < valid_hi)
        shape = [1, 1]
        shape[axis] = size
        valid = valid.reshape(shape)
        total = total + jnp.where(valid[..., None], shifted, 0.0)
        count = count + jnp.where(valid, ones, 0.0)
    return total / count[..., None]


def box_blur(image: jnp.ndarray, radius: int = DEFAULT_RADIUS) -> jnp.ndarray:
    """Separable box blur, horizontal then vertical (raytracing.cu:379-380)."""
    blurred = _box_blur_axis(image, radius, axis=1)
    return _box_blur_axis(blurred, radius, axis=0)


def apply_bloom(
    accumulated: jnp.ndarray, rays_per_pixel: int, radius: int = DEFAULT_RADIUS
) -> jnp.ndarray:
    """Full bloom chain on an (H, W, 3) raw accumulated framebuffer."""
    threshold = np.float32(THRESHOLD_SCALE * rays_per_pixel)
    bright = high_pass(accumulated, threshold)
    return accumulated + box_blur(bright, radius)
