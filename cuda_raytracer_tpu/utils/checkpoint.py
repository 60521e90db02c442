"""Checkpoint / resume for long renders (SURVEY §5.4).

The reference's pass loop (20 spp chunks accumulating into a persistent
framebuffer) is structurally resumable but never persisted; here every pass
boundary can be checkpointed: (framebuffer raw sums, samples-done, a config
fingerprint). Restart resumes at the exact pass seed — pass seeds derive from
``remaining_rays``, so a resumed render is bit-identical to an uninterrupted
one. Plain .npz on purpose: single-host artefact, no orbax dependency.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import tempfile
from typing import Optional, Tuple

import numpy as np

from cuda_raytracer_tpu.models.scene import Scene


def scene_fingerprint(scene: Scene) -> str:
    """Stable hash of the scene's identity: static config + array checksums.
    Guards against resuming with a different scene/resolution."""
    h = hashlib.sha256()
    h.update(json.dumps(dataclasses.asdict(scene.config), sort_keys=True).encode())
    for name in ("sphere_center", "tri_p1", "material_index"):
        arr = np.asarray(getattr(scene, name))
        h.update(name.encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes()[:4096])
    return h.hexdigest()[:16]


def save_checkpoint(
    path: str,
    framebuffer: np.ndarray,
    samples_done: int,
    fingerprint: str,
    suspects: int = 0,
) -> None:
    """Atomic write (tmp + rename) so a crash mid-save never corrupts.

    ``suspects`` persists the closest-hit exactness certificate's running
    count: a resumed render must re-enforce the certificate over the passes
    it did NOT re-run, otherwise resuming a finished-but-suspect render
    would silently return the exact image the certificate rejected."""
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                framebuffer=np.asarray(framebuffer),
                samples_done=np.int64(samples_done),
                fingerprint=np.bytes_(fingerprint.encode()),
                suspects=np.int64(suspects),
            )
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(
    path: str, fingerprint: str
) -> Optional[Tuple[np.ndarray, int, int]]:
    """Returns (framebuffer, samples_done, suspects) or None when
    absent/mismatched. Checkpoints written before the certificate was
    persisted load with suspects=0."""
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        stored = bytes(data["fingerprint"]).decode()
        if stored != fingerprint:
            return None
        suspects = int(data["suspects"]) if "suspects" in data.files else 0
        return data["framebuffer"].copy(), int(data["samples_done"]), suspects
