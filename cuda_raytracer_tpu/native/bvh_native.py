"""ctypes binding for the C++ BVH builder (native/bvh_builder.cpp).

Compiles the shared library on first use (cached next to the source; rebuilt
when the source is newer). Falls back to None-returning stubs when no C++
toolchain is available, letting models/bvh.py use the NumPy oracle builder.
Set ``CRT_DISABLE_NATIVE=1`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libcrt_native.so")
_SRC_PATH = os.path.join(_HERE, "bvh_builder.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _HERE],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("CRT_DISABLE_NATIVE") == "1":
            _load_failed = True
            return None
        needs_build = not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
        )
        if needs_build and not _compile():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.crt_build_bvh.restype = ctypes.c_int
        lib.crt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # p1
            ctypes.POINTER(ctypes.c_float),  # p2
            ctypes.POINTER(ctypes.c_float),  # p3
            ctypes.c_int64,  # tri_count
            ctypes.c_int,  # max_depth
            ctypes.POINTER(ctypes.c_float),  # node_min
            ctypes.POINTER(ctypes.c_float),  # node_max
            ctypes.POINTER(ctypes.c_int32),  # child1
            ctypes.POINTER(ctypes.c_int32),  # child2
            ctypes.POINTER(ctypes.c_int32),  # order
            ctypes.POINTER(ctypes.c_int64),  # node_count
            ctypes.POINTER(ctypes.c_int64),  # max_leaf
        ]
        _lib = lib
        return _lib


def build_bvh_native(p1, p2, p3, max_depth):
    """Build a BVH with the C++ builder; returns BvhArrays or None if the
    native library is unavailable."""
    from cuda_raytracer_tpu.models.bvh import BvhArrays

    lib = get_lib()
    if lib is None:
        return None

    tri_count = int(p1.shape[0])
    p1 = np.ascontiguousarray(p1, np.float32)
    p2 = np.ascontiguousarray(p2, np.float32)
    p3 = np.ascontiguousarray(p3, np.float32)
    cap = 2 * tri_count + 1
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    child1 = np.empty(cap, np.int32)
    child2 = np.empty(cap, np.int32)
    order = np.empty(tri_count, np.int32)
    node_count = ctypes.c_int64()
    max_leaf = ctypes.c_int64()

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    status = lib.crt_build_bvh(
        p1.ctypes.data_as(fp),
        p2.ctypes.data_as(fp),
        p3.ctypes.data_as(fp),
        ctypes.c_int64(tri_count),
        ctypes.c_int(max_depth),
        node_min.ctypes.data_as(fp),
        node_max.ctypes.data_as(fp),
        child1.ctypes.data_as(ip),
        child2.ctypes.data_as(ip),
        order.ctypes.data_as(ip),
        ctypes.byref(node_count),
        ctypes.byref(max_leaf),
    )
    if status != 0:
        return None
    n = node_count.value
    return BvhArrays(
        node_min=node_min[:n].copy(),
        node_max=node_max[:n].copy(),
        child1=child1[:n].copy(),
        child2=child2[:n].copy(),
        order=order,
        max_leaf_size=int(max_leaf.value),
    )
