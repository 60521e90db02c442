"""CLI driver, checkpoint/resume, and metrics tests."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render.pipeline import render_framebuffer
from cuda_raytracer_tpu.utils import checkpoint as ckpt
from cuda_raytracer_tpu.utils.metrics import Metrics, live_fraction

REF = "/root/reference"


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""  # let the subprocess pick its default
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # Force CPU inside the subprocess via a sitecustomize-resistant wrapper.
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "from jax.extend.backend import clear_backends; clear_backends()\n"
        "import sys; from cuda_raytracer_tpu.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    result = _run_cli(
        [
            f"{REF}/cornell.scene",
            "no_sort",
            "--width", "16", "--height", "16", "--spp", "2", "--bounces", "2",
            "--out", str(tmp_path / "out.png"),
            "--metrics",
        ],
        cwd=str(tmp_path),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert (tmp_path / "out.png").exists()
    assert "paths/s" in result.stderr


@pytest.mark.slow
def test_cli_packet_tuning_flags(tmp_path):
    """--packet-tile / --cluster-tris / --packet-skip / --cull-split /
    --cull-hier reach the intersector config and still render (the knobs
    scan_skip.py sweeps on hardware)."""
    result = _run_cli(
        [
            f"{REF}/cornell.scene",
            "--width", "16", "--height", "16", "--spp", "1", "--bounces", "2",
            "--packet-tile", "32", "--cluster-tris", "128", "--packet-skip",
            "--cull-split", "2", "--cull-hier", "16",
            "--out", str(tmp_path / "out.png"),
        ],
        cwd=str(tmp_path),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert (tmp_path / "out.png").exists()


def test_cli_no_backend_exit_code(tmp_path):
    # Reference: "No raytracing hardware specified" → exit 2
    # (raytracing.cu:338-342).
    from cuda_raytracer_tpu.cli import main

    assert main([f"{REF}/cornell.scene", "no_gpu"]) == 2


def test_cli_usage_exit_code():
    from cuda_raytracer_tpu.cli import main

    assert main([]) == 1


def test_cli_unknown_flag():
    from cuda_raytracer_tpu.cli import main

    assert main([f"{REF}/cornell.scene", "bogus_flag"]) == 1


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck.npz")
    fb = np.random.default_rng(0).uniform(size=(16, 3)).astype(np.float32)
    ckpt.save_checkpoint(path, fb, 7, "fingerprint1")
    restored = ckpt.load_checkpoint(path, "fingerprint1")
    assert restored is not None
    np.testing.assert_array_equal(restored[0], fb)
    assert restored[1] == 7
    # Mismatched fingerprint → rejected.
    assert ckpt.load_checkpoint(path, "other") is None


def test_checkpoint_resume_bit_identical(tmp_path):
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(
            width=4, height=4, rays_per_pixel=6, bounces=2,
            max_rays_per_pixel_per_pass=2,
        ),
        prefer_native_bvh=False,
    )
    straight = np.asarray(render_framebuffer(scene))

    # Simulate an interrupted render: checkpoint after every pass, then
    # delete progress and resume from the snapshot at 4/6 samples.
    path = str(tmp_path / "render.npz")
    fingerprint = ckpt.scene_fingerprint(scene)
    fb = jnp.zeros((16, 3))
    from cuda_raytracer_tpu.render.pipeline import render_pass

    remaining = 6
    while remaining > 2:  # run first two passes only
        chunk = min(remaining, 2)
        remaining -= chunk
        fb, _suspect = render_pass(scene, fb, jnp.uint32(remaining),
                                   rays_per_pixel=chunk, bounces=2,
                                   sort_rays=True)
    ckpt.save_checkpoint(path, np.asarray(fb), 4, fingerprint)

    resumed = np.asarray(
        render_framebuffer(scene, checkpoint_path=path)
    )
    np.testing.assert_array_equal(resumed, straight)


def test_metrics_registry():
    metrics = Metrics()
    with metrics.phase("build"):
        pass
    metrics.count("rays", 100)
    metrics.count("rays", 50)
    metrics.record("live", 0.5)
    assert metrics.counters["rays"] == 150
    assert "build" in metrics.phases
    line = metrics.emit(stream=open(os.devnull, "w"), scene="s")
    assert "live" in line


def test_live_fraction():
    transmitted = jnp.asarray([[1.0, 0, 0], [0, 0, 0], [0, 0.5, 0], [0, 0, 0]])
    assert live_fraction(transmitted) == 0.5


def test_persistent_compile_cache(tmp_path, monkeypatch):
    """enable_persistent_cache points JAX at a writable cache dir and a
    compiled function actually populates it; CUDA_RAYTRACER_TPU_NO_CACHE
    opts out."""
    import jax

    from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

    monkeypatch.delenv("CUDA_RAYTRACER_TPU_NO_CACHE", raising=False)
    cache_dir = str(tmp_path / "jc")
    assert enable_persistent_cache(cache_dir) == cache_dir
    assert jax.config.jax_compilation_cache_dir == cache_dir
    # Force min compile time to zero so even this tiny program is written.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.jit(lambda x: x * 2.0 + 1.0)(jnp.arange(64, dtype=jnp.float32)).block_until_ready()
        assert os.listdir(cache_dir), "compiled program not persisted"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    monkeypatch.setenv("CUDA_RAYTRACER_TPU_NO_CACHE", "1")
    assert enable_persistent_cache(str(tmp_path / "other")) is None
