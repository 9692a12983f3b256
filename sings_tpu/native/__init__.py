"""Native (C++) runtime pieces, loaded via ctypes.

The compute path is Pallas/XLA; the host-side runtime around it uses
C++ where python would bottleneck: currently the density-control mesh
surgery (greedy edge collapse — O(V) per collapse in numpy, O(deg log E)
here). Built on first use with g++ (baked into the image); a numpy
fallback (mesh/ops.py) keeps everything working without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "mesh_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_mesh_native.so")
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.collapse_edges_native.restype = ctypes.c_int32
    lib.collapse_edges_native.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_double,
    ]
    lib.count_unique_edges.restype = ctypes.c_int64
    lib.count_unique_edges.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    _lib = lib
    return _lib


def _cptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def collapse_edges_fast(
    verts: np.ndarray,
    verts_attr: np.ndarray,
    selected_edges: np.ndarray,
    faces: np.ndarray,
    collapse_rate: float = 0.5,
):
    """Native-or-numpy greedy edge collapse.

    Same contract as mesh.ops.collapse_edges: returns
    (new_verts, new_faces(local ids), new_verts_attr, prune_mask).
    """
    lib = get_lib()
    if lib is None:
        from ..mesh.ops import collapse_edges

        return collapse_edges(verts, verts_attr, selected_edges, faces,
                              collapse_rate)

    v = np.ascontiguousarray(verts, np.float32).copy()
    a = np.ascontiguousarray(verts_attr, np.float32).copy()
    a2 = a.reshape(len(v), -1)
    e = np.ascontiguousarray(selected_edges, np.int32)
    f = np.ascontiguousarray(faces, np.int32).copy()
    face_keep = np.zeros(len(f), np.uint8)
    vert_keep = np.zeros(len(v), np.uint8)

    lib.collapse_edges_native(
        _cptr(v, ctypes.c_float), len(v),
        _cptr(a2, ctypes.c_float), a2.shape[1],
        _cptr(e, ctypes.c_int32), len(e),
        _cptr(f, ctypes.c_int32), len(f),
        _cptr(face_keep, ctypes.c_uint8), _cptr(vert_keep, ctypes.c_uint8),
        float(collapse_rate),
    )

    keep_mask = vert_keep.astype(bool)
    kept = np.where(keep_mask)[0]
    inverse = np.full(len(v), -1, np.int64)
    inverse[kept] = np.arange(len(kept))
    new_faces = inverse[f[face_keep.astype(bool)]]
    new_verts = v[keep_mask]
    new_attr = a2[keep_mask].reshape((len(kept),) + verts_attr.shape[1:])
    return new_verts, new_faces, new_attr, ~keep_mask
