"""Tonemap + bloom + PNG tests (reference: raytracing.cu:21-74,286-303)."""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.ops import bloom, tonemap
from cuda_raytracer_tpu.utils import png


def test_tonemap_formula():
    acc = jnp.asarray(np.array([[0.0, 1.0, 3.0]], np.float32))
    out = np.asarray(tonemap.tonemap(acc, exposure=2.0, rays_per_pixel=1))
    expect = np.sqrt((2 * np.array([0.0, 1.0, 3.0])) / (2 * np.array([0.0, 1.0, 3.0]) + 1))
    assert np.allclose(out, expect, atol=1e-6)


def test_tonemap_bytes_range():
    acc = jnp.asarray(np.linspace(0, 100, 30, dtype=np.float32).reshape(10, 3))
    b = np.asarray(tonemap.to_bytes(tonemap.tonemap(acc, 1.0, 1)))
    assert b.dtype == np.uint8
    assert b.min() >= 0 and b.max() <= 255


def _box_blur_oracle(img, radius):
    h, w, _ = img.shape
    out_h = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            lo, hi = max(0, x - radius), min(w - 1, x + radius)
            out_h[y, x] = img[y, lo : hi + 1].mean(axis=0)
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            lo, hi = max(0, y - radius), min(h - 1, y + radius)
            out[y, x] = out_h[lo : hi + 1, x].mean(axis=0)
    return out


def test_box_blur_matches_oracle_with_edge_divisor():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 10, (9, 13, 3)).astype(np.float32)
    ours = np.asarray(bloom.box_blur(jnp.asarray(img), radius=2))
    ref = _box_blur_oracle(img, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_high_pass_threshold():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [10, 10, 10]  # luminance 10
    img[1, 1] = [0.1, 0.1, 0.1]
    out = np.asarray(bloom.high_pass(jnp.asarray(img), threshold=5.0))
    assert np.allclose(out[0, 0], 10.0)
    assert np.allclose(out[1, 1], 0.0)


def test_bloom_adds_glow_around_bright_pixel():
    img = np.zeros((11, 11, 3), np.float32)
    img[5, 5] = [100, 100, 100]
    out = np.asarray(bloom.apply_bloom(jnp.asarray(img), rays_per_pixel=1))
    # Bright pixel got brighter; neighbours within radius 5 got light.
    assert out[5, 5, 0] > 100
    assert out[5, 0, 0] > 0
    assert np.allclose(out[0, 0], img[0, 0] + out[0, 0] - img[0, 0])


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    path = tmp_path / "t.png"
    png.write_png(str(path), img)
    back = png.read_png(str(path))
    np.testing.assert_array_equal(img, back)


def test_read_reference_render():
    ref = png.read_png("/root/reference/renders/cornell.png")
    assert ref.shape == (1000, 1000, 3)
