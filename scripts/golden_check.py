"""Golden-image validation against the reference's own renders.

Renders the complete-asset scenes (spheres, cornell, cornell_plus) through
the full pipeline (pass loop -> bloom -> tonemap) and compares the display
images statistically against /root/reference/renders/*.png (1000x1000,
1000 spp, the reference's committed outputs — README.md:37-38). Also runs
structural checks on the substitute-sky scenes (teapot/glass_teapot/lamp),
whose absolute pixels cannot match (the checkout is missing envmap.pfm).

Metrics per scene (computed on 100x100 box-downsampled display images, which
averages away Monte-Carlo noise at moderate spp):
  corr — Pearson correlation of pixel values; mae — mean |diff| in display
  units (0-255); mean_ratio — our mean / golden mean.

Usage: python scripts/golden_check.py [out.json] [--spp N] [--size N]
Writes renders to renders/ and the verdict JSON (default GOLDEN.json).
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

# Acceptance thresholds, evaluated in DISPLAY space on 100x100 box-
# downsampled cells. Known estimator bias at finite spp, accounted for in
# the mean_ratio band: the x/(x+1)+sqrt tonemap is concave, so Jensen's
# inequality pushes noisy renders dark relative to the 1000-spp golden
# (measured: cornell display mean ratio 0.88 at 64 spp, converging toward 1
# as spp grows; spheres — low-variance, mostly direct sky — sits at 0.998
# already). Radiance-space comparison was tried and is worse: inverting the
# golden's uint8 display silently clamps its fireflies while our raw float
# framebuffer keeps them (emitter radiance 30 vs wall radiance ~0.1), so
# raw-mean ratios blow up (1.9 on cornell at 16 spp). Display metrics are
# the gate; the structural corr requirement is tight and spp-insensitive.
THRESHOLDS = dict(corr=0.96, mae=15.0, mean_ratio=(0.85, 1.08))
# At (near-)matched spp the Jensen bias vanishes, so the gate tightens: the
# render must sit on the golden, not merely correlate with it. Applied at
# spp >= 500 (the goldens are 1000 spp; the bias measured <1% by 640 spp).
TIGHT_THRESHOLDS = dict(corr=0.99, mae=5.0, mean_ratio=(0.98, 1.02))
TIGHT_SPP = 500
GOLDEN_SCENES = ("spheres", "cornell", "cornell_plus")
STRUCTURAL_SCENES = ("teapot", "glass_teapot", "lamp")


def downsample(img: np.ndarray, out: int = 100) -> np.ndarray:
    h, w, c = img.shape
    f = h // out
    return img[: out * f, : out * f].reshape(out, f, out, f, c).mean(axis=(1, 3))


def compare(display: np.ndarray, golden_u8: np.ndarray, spp: int = 0) -> dict:
    """display: our (H, W, 3) uint8 tonemapped render; golden_u8: reference
    display PNG. Metrics on 100x100 downsampled cells; near-matched spp
    (>= TIGHT_SPP) is gated on the tight thresholds."""
    thresholds = TIGHT_THRESHOLDS if spp >= TIGHT_SPP else THRESHOLDS
    a = downsample(display.astype(np.float32))
    b = downsample(golden_u8.astype(np.float32))
    corr = float(np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1])
    mae = float(np.abs(a - b).mean())
    mean_ratio = float(a.mean() / max(b.mean(), 1e-6))
    ok = (
        corr >= thresholds["corr"]
        and mae <= thresholds["mae"]
        and thresholds["mean_ratio"][0] <= mean_ratio <= thresholds["mean_ratio"][1]
    )
    return dict(corr=corr, mae=mae, mean_ratio=mean_ratio, ok=bool(ok),
                tight=spp >= TIGHT_SPP)


def structural_check(img: np.ndarray, sky_visible: bool) -> dict:
    """Substitute-sky scenes: the image must be finite, non-degenerate, and
    structured. For open scenes (teapot/glass_teapot) the sky band at the top
    must differ from the object band in the centre; the lamp interior has no
    sky, so only finiteness + spatial structure are gated there."""
    f = img.astype(np.float32)
    top = f[: f.shape[0] // 8].mean(axis=(0, 1))
    mid = f[3 * f.shape[0] // 8 : 5 * f.shape[0] // 8].mean(axis=(0, 1))
    contrast = float(np.abs(top - mid).mean())
    blocks = downsample(f, 25)
    block_spread = float(blocks.mean(axis=-1).std())
    ok = bool(np.isfinite(f).all() and f.std() > 10.0 and block_spread > 8.0)
    if sky_visible:
        ok = ok and contrast > 5.0
    return dict(
        std=float(f.std()),
        sky_object_contrast=contrast,
        block_spread=block_spread,
        ok=ok,
    )


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_path", nargs="?", default="GOLDEN.json")
    parser.add_argument("--spp", type=int, default=64)
    parser.add_argument("--size", type=int, default=1000)
    parser.add_argument("--scenes", default=None, help="comma list")
    parser.add_argument(
        "--merge", action="store_true",
        help="update an existing report instead of replacing it",
    )
    parsed = parser.parse_args()
    out_path = parsed.out_path
    spp = parsed.spp
    size = parsed.size
    merge = parsed.merge
    scenes = (
        tuple(parsed.scenes.split(","))
        if parsed.scenes else GOLDEN_SCENES + STRUCTURAL_SCENES
    )

    import time
    import warnings

    import jax
    import numpy as _np

    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.ops import bloom as bloom_ops
    from cuda_raytracer_tpu.ops import tonemap as tonemap_ops
    from cuda_raytracer_tpu.render.pipeline import render_framebuffer
    from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache
    from cuda_raytracer_tpu.utils.png import read_png, write_png

    enable_persistent_cache()

    os.makedirs("/root/repo/renders", exist_ok=True)
    report = {"backend": jax.default_backend(), "spp": spp, "size": size,
              "seconds_note": "cold timings incl. jit compile; see BENCHMARKS.md for warm render times"}
    if merge and os.path.exists(out_path):
        with open(out_path) as f:
            report.update(json.load(f))
        report.update(backend=jax.default_backend(), spp=spp, size=size)
    all_ok = True
    for name in scenes:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            scene = load_scene(
                f"/root/reference/{name}.scene",
                config_overrides=dict(width=size, height=size, rays_per_pixel=spp),
            )
        start = time.perf_counter()
        fb = render_framebuffer(scene)
        fb.block_until_ready()
        seconds = time.perf_counter() - start
        raw = _np.asarray(
            bloom_ops.apply_bloom(fb.reshape(size, size, 3), spp)
        )
        display = _np.asarray(
            tonemap_ops.to_bytes(tonemap_ops.tonemap(raw, scene.config.exposure, spp))
        )
        write_png(f"/root/repo/renders/{name}.png", display)
        if name in GOLDEN_SCENES:
            golden = read_png(f"/root/reference/renders/{name}.png")
            result = compare(display, golden, spp)
        else:
            result = structural_check(display, sky_visible=name != "lamp")
        result["seconds"] = round(seconds, 3)  # includes jit compile
        result["spp"] = spp
        report[name] = result
        print(f"{name}: {result}", flush=True)
    all_ok = all(
        report[n]["ok"]
        for n in GOLDEN_SCENES + STRUCTURAL_SCENES
        if n in report
    )
    report["ok"] = all_ok
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"golden_ok": all_ok}))
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
