"""Native (C++) components, loaded via ctypes.

The reference implements its builder/runtime in C++; tpu_rt keeps the
performance-critical *host* path native too: the SBVH build + flatten +
Woop transform runs as one C++ call for big scenes (hairball: 6.5M tris),
with tpu_rt/bvh/builder.py as the semantic definition and fallback.

The shared library is compiled on demand with g++ (no pybind11 in the
image; plain C ABI + ctypes) and cached next to this file.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libtpurt_native.so")
_SRC = os.path.join(_HERE, "sbvh.cc")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _compile() -> str | None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO_PATH,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ invocation failed: {e}"
    if proc.returncode != 0:
        return f"g++ failed:\n{proc.stderr[-2000:]}"
    return None


def get_lib():
    """Load (compiling if needed) the native library, or None if
    unavailable — callers fall back to the numpy implementation."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC):
            err = _compile()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            _build_error = str(e)
            return None

        lib.sbvh_build.restype = ctypes.c_int
        lib.sbvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,          # tri_vtx, num_tris
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,        # vtx_pos, num_verts
            ctypes.c_float, ctypes.c_int, ctypes.c_int,          # alpha, min_leaf, max_leaf
            ctypes.c_float, ctypes.c_float,                      # tri_cost, node_cost
            ctypes.c_int, ctypes.c_int, ctypes.c_int,            # depths, bins
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_double),
        ]
        lib.sbvh_free.restype = None
        lib.sbvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def build_error() -> str | None:
    return _build_error


def sbvh_build_native(tri_vtx_index, vtx_pos, platform, params):
    """Native SBVH build+flatten.  Returns (FlatBVH arrays dict, stats dict)
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None

    tri_vtx = np.ascontiguousarray(tri_vtx_index, np.int32)
    vtx = np.ascontiguousarray(vtx_pos, np.float32)
    num_tris = int(tri_vtx.shape[0])
    num_verts = int(vtx.shape[0])

    nodes_p = ctypes.POINTER(ctypes.c_float)()
    woop_p = ctypes.POINTER(ctypes.c_float)()
    tri_index_p = ctypes.POINTER(ctypes.c_int)()
    leaf_counts_p = ctypes.POINTER(ctypes.c_int)()
    n_nodes = ctypes.c_longlong()
    n_refs = ctypes.c_longlong()
    n_dup = ctypes.c_longlong()
    sah = ctypes.c_double()

    rc = lib.sbvh_build(
        tri_vtx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_tris,
        vtx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_verts,
        ctypes.c_float(params.split_alpha),
        platform.min_leaf_size, platform.max_leaf_size,
        ctypes.c_float(platform.sah_triangle_cost), ctypes.c_float(platform.sah_node_cost),
        params.max_depth, params.max_spatial_depth, params.num_spatial_bins,
        ctypes.byref(nodes_p), ctypes.byref(n_nodes),
        ctypes.byref(woop_p), ctypes.byref(n_refs),
        ctypes.byref(tri_index_p), ctypes.byref(leaf_counts_p),
        ctypes.byref(n_dup), ctypes.byref(sah),
    )
    if rc != 0:
        return None

    nn, nr = int(n_nodes.value), int(n_refs.value)
    try:
        nodes = np.ctypeslib.as_array(nodes_p, shape=(nn, 16)).copy()
        woop = np.ctypeslib.as_array(woop_p, shape=(max(nr, 1), 12))[:nr].copy()
        tri_index = np.ctypeslib.as_array(tri_index_p, shape=(max(nr, 1),))[:nr].copy()
        leaf_counts = np.ctypeslib.as_array(leaf_counts_p, shape=(nr + 1,)).copy()
    finally:
        for p in (nodes_p, woop_p, tri_index_p, leaf_counts_p):
            lib.sbvh_free(ctypes.cast(p, ctypes.c_void_p))

    arrays = {
        "nodes": nodes.astype(np.float32),
        "tri_woop": woop.astype(np.float32),
        "tri_index": tri_index.astype(np.int32),
        "leaf_counts": leaf_counts.astype(np.int32),
    }
    stats = {"num_duplicates": int(n_dup.value), "sah_cost": float(sah.value)}
    return arrays, stats
