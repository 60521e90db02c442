"""The examples must keep running end-to-end (they are user-facing API
demos; the capability itself — gradients reaching material parameters — is
unit-tested in tests/test_diff.py)."""

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_inverse_render_example_recovers_walls(tmp_path):
    # Tiny settings: exits 0 iff the recovered coloured-wall albedos land
    # within 0.15 of the truth (examples/inverse_render.py's own bar).
    proc = subprocess.run(
        [
            sys.executable, "examples/inverse_render.py", "--cpu",
            "--size", "24", "--spp", "4", "--steps", "50",
            "--bounces", "3", "--out", str(tmp_path),
        ],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert (tmp_path / "recovered.png").exists()
