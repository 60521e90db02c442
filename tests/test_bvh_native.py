"""C++ builder vs NumPy oracle builder: array-for-array equality."""

import numpy as np
import pytest

from cuda_raytracer_tpu.models import bvh as bvh_mod
from cuda_raytracer_tpu.native import bvh_native

from test_bvh import random_triangles


def _native_or_skip(p1, p2, p3, max_depth=30):
    built = bvh_native.build_bvh_native(p1, p2, p3, max_depth)
    if built is None:
        pytest.skip("native builder unavailable (no toolchain)")
    return built


@pytest.mark.parametrize("n,seed", [(10, 0), (500, 1), (5000, 2)])
def test_native_matches_numpy(n, seed):
    p1, p2, p3 = random_triangles(n, seed=seed)
    native = _native_or_skip(p1, p2, p3)
    ref = bvh_mod.build_bvh_numpy(p1, p2, p3)
    np.testing.assert_array_equal(native.child1, ref.child1)
    np.testing.assert_array_equal(native.child2, ref.child2)
    np.testing.assert_array_equal(native.order, ref.order)
    np.testing.assert_allclose(native.node_min, ref.node_min, rtol=1e-6)
    np.testing.assert_allclose(native.node_max, ref.node_max, rtol=1e-6)
    assert native.max_leaf_size == ref.max_leaf_size


def test_native_validates():
    p1, p2, p3 = random_triangles(3000, seed=5)
    native = _native_or_skip(p1, p2, p3)
    assert bvh_mod.validate_bvh(native, 3000) is None


def test_native_no_bvh_mode():
    p1, p2, p3 = random_triangles(64, seed=9)
    native = _native_or_skip(p1, p2, p3, max_depth=0)
    assert native.child1.shape[0] == 1
    assert native.max_leaf_size == 64


def test_native_handles_teapot_mesh():
    from cuda_raytracer_tpu.models import ply

    p1, p2, p3 = ply.load_ply("/root/reference/teapot/models/Mesh000.ply")
    native = _native_or_skip(p1, p2, p3)
    assert bvh_mod.validate_bvh(native, p1.shape[0]) is None
    # A real mesh should split deeply.
    assert native.child1.shape[0] > 1000
