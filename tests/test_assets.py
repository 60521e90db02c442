"""PLY / PFM loader tests (reference: scene.cu:489-567)."""

import struct

import numpy as np
import pytest

from cuda_raytracer_tpu.models import pfm, ply

REF = "/root/reference"


def make_ply(vertices, faces) -> bytes:
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(vertices)}\n"
        + "".join(f"property float {p}\n" for p in "x y z nx ny nz u v".split())
        + f"element face {len(faces)}\n"
        "property list uint8 int vertex_indices\n"
        "end_header\n"
    ).encode()
    body = b""
    for v in vertices:
        body += struct.pack("<8f", *v, 0, 0, 1, 0, 0)
    for f in faces:
        body += struct.pack("<B", len(f)) + struct.pack(f"<{len(f)}i", *f)
    return header + body


def test_ply_triangles(tmp_path):
    path = tmp_path / "tri.ply"
    path.write_bytes(
        make_ply([(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)], [(0, 1, 2), (1, 3, 2)])
    )
    p1, p2, p3 = ply.load_ply(str(path))
    assert p1.shape == (2, 3)
    assert np.allclose(p1[0], [0, 0, 0]) and np.allclose(p3[1], [0, 1, 0])


def test_ply_fan_triangulation(tmp_path):
    # A quad face fan-triangulates to (v0,v1,v2), (v0,v2,v3) — scene.cu:534-545.
    path = tmp_path / "quad.ply"
    path.write_bytes(
        make_ply([(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)], [(0, 1, 2, 3)])
    )
    p1, p2, p3 = ply.load_ply(str(path))
    assert p1.shape == (2, 3)
    assert np.allclose(p2[0], [1, 0, 0])
    assert np.allclose(p2[1], [1, 1, 0])
    assert np.allclose(p3[1], [0, 1, 0])


def test_ply_reference_teapot_counts():
    # SURVEY §2.27: the two teapot meshes total 126,048 triangles.
    total = 0
    for name in ("Mesh000.ply", "Mesh001.ply"):
        p1, _, _ = ply.load_ply(f"{REF}/teapot/models/{name}")
        total += p1.shape[0]
    assert total == 126048


def test_ply_rejects_wrong_layout(tmp_path):
    bad = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 1\nproperty float x\nproperty float y\nproperty float z\n"
        b"element face 0\nproperty list uint8 int vertex_indices\nend_header\n"
        + struct.pack("<3f", 0, 0, 0)
    )
    path = tmp_path / "bad.ply"
    path.write_bytes(bad)
    with pytest.raises(ValueError):
        ply.load_ply(str(path))


def test_pfm_roundtrip(tmp_path):
    image = np.random.default_rng(0).uniform(0, 10, (7, 5, 3)).astype(np.float32)
    path = tmp_path / "test.pfm"
    pfm.write_pfm(str(path), image)
    loaded = pfm.load_pfm(str(path))
    assert loaded.shape == (7, 5, 3)
    assert np.array_equal(loaded, image)
    assert pfm.image_dims(str(path)) == (5, 7)
