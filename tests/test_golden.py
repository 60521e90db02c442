"""Golden-image validation against the reference's committed renders.

The reference's own verification was eyeballing renders/*.png
(/root/reference/renders, README.md:37-38); here it is automated. The tight
full-resolution check over every scene runs on TPU via
scripts/golden_check.py (committed per round as GOLDEN.json); these tests
keep a CPU-affordable subset in the default suite:

  * spheres at native 1000x1000 (the comparison must be at native res —
    bloom is a pixel-space effect, so its contribution scales with
    resolution; measured: cornell display mean is ~30% bloom at 160px but
    matches the golden to 0.04% at native res) with few samples, compared on
    10x-downsampled display images where Monte-Carlo noise averages out.
  * cornell at reduced res as a loose structural smoke (gross-breakage
    guard: orientation, exposure, wall colours).

Known bias, not a bug: low-spp renders are systematically DARKER than the
1000-spp goldens because the tonemap sqrt(p/(p+1)) is concave — Jensen's
inequality turns zero-mean radiance noise into a negative display-mean bias.
Measured on cornell at 100px: display mean ratio vs golden 0.946 / 0.999 /
1.047 at 40 / 160 / 640 spp (the >1 tail is the resolution-dependent bloom
of the downsampled golden, see above). At the goldens' own 1000 spp the
bias vanishes and the gate tightens: GOLDEN.json (round 3, TPU, 1000x1000
at 1000 spp) records corr 0.991-0.996, mae <= 1.9, mean_ratio 1.001-1.013
on spheres/cornell/cornell_plus — the render sits ON the golden.
"""

import numpy as np
import pytest

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render.pipeline import render_image
from cuda_raytracer_tpu.utils.png import read_png

REF = "/root/reference"


def _downsample(img, out):
    h = img.shape[0]
    f = h // out
    return (
        img[: out * f, : out * f]
        .astype(np.float32)
        .reshape(out, f, out, f, 3)
        .mean(axis=(1, 3))
    )


def test_spheres_matches_golden_native_res():
    scene = load_scene(
        f"{REF}/spheres.scene",
        config_overrides=dict(width=1000, height=1000, rays_per_pixel=4),
    )
    img = render_image(scene)
    golden = read_png(f"{REF}/renders/spheres.png")
    a = _downsample(img, 100)
    b = _downsample(golden, 100)
    corr = float(np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1])
    mae = float(np.abs(a - b).mean())
    ratio = float(a.mean() / b.mean())
    # Measured at 8 spp: corr 0.988, mae 2.0, ratio 1.007 (golden is
    # 1000 spp); thresholds leave room for the extra noise at 4 spp.
    assert corr > 0.96, corr
    assert mae < 5.0, mae
    assert 0.94 < ratio < 1.07, ratio


def test_cornell_structural_smoke():
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(width=160, height=160, rays_per_pixel=24),
    )
    img = render_image(scene).astype(np.float32)
    golden = _downsample(read_png(f"{REF}/renders/cornell.png"), 40)
    a = _downsample(img, 40)
    corr = float(np.corrcoef(a.reshape(-1), golden.reshape(-1))[0, 1])
    assert corr > 0.8, corr  # loose: bloom scales with resolution
    # Wall colours: left band redder than right, right band greener than left.
    left = img[60:120, :30].mean(axis=(0, 1))
    right = img[60:120, -30:].mean(axis=(0, 1))
    assert left[0] > left[1], left
    assert right[1] > right[0], right
    # Area light: the brightest 4x4-px cell sits in the top-centre region.
    cell = a.mean(axis=-1)
    row, col = np.unravel_index(np.argmax(cell), cell.shape)
    assert row < 10, (row, col)
    assert 10 <= col <= 30, (row, col)
