"""ctypes bindings for the native (C++) host components.

The reference's host pipeline is all native C++ (SURVEY.md section 2: OBJ
parse, KD build); here the equivalents live in native/*.cpp behind a plain
C ABI (no pybind11 in this image). Libraries are compiled on first use with
g++ and cached next to the sources; every native path has a pure
numpy/Python fallback with identical output, so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LOCK = threading.Lock()
_LIBS: dict = {}


def _load(name: str) -> Optional[ctypes.CDLL]:
    """Load lib<name>.so, building it with make/g++ on first use."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        path = os.path.join(_NATIVE_DIR, f"lib{name}.so")
        if not os.path.exists(path):
            src = {
                "kdbuild": "kd_builder.cpp",
                "objload": "obj_loader.cpp",
            }[name]
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17",
                     "-shared", "-o", path, os.path.join(_NATIVE_DIR, src)],
                    check=True, capture_output=True, timeout=300,
                )
            except (subprocess.SubprocessError, FileNotFoundError) as e:
                print(f"native build of {name} failed ({e}); using Python fallback",
                      file=sys.stderr)
                _LIBS[name] = None
                return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _LIBS[name] = None
            return None
        _LIBS[name] = lib
        return lib


class _KDResult(ctypes.Structure):
    _fields_ = [
        ("child_a", ctypes.POINTER(ctypes.c_int32)),
        ("child_b", ctypes.POINTER(ctypes.c_int32)),
        ("axis", ctypes.POINTER(ctypes.c_int32)),
        ("plane", ctypes.POINTER(ctypes.c_float)),
        ("is_leaf", ctypes.POINTER(ctypes.c_uint8)),
        ("n_nodes", ctypes.c_int64),
        ("tri_indices", ctypes.POINTER(ctypes.c_int32)),
        ("n_indices", ctypes.c_int64),
        ("bbox_min", ctypes.c_float * 3),
        ("bbox_max", ctypes.c_float * 3),
    ]


def kd_build_native(vertices: np.ndarray, max_depth: int, leaf_size: int):
    """Returns dict of numpy arrays, or None if the native lib is absent."""
    lib = _load("kdbuild")
    if lib is None:
        return None
    lib.kd_build.restype = ctypes.POINTER(_KDResult)
    lib.kd_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.kd_free.argtypes = [ctypes.POINTER(_KDResult)]

    vertices = np.ascontiguousarray(vertices, np.float32)
    n = len(vertices)
    res = lib.kd_build(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        max_depth, leaf_size,
    )
    try:
        r = res.contents
        k = r.n_nodes
        i = r.n_indices
        out = {
            "child_a": np.ctypeslib.as_array(r.child_a, (k,)).copy(),
            "child_b": np.ctypeslib.as_array(r.child_b, (k,)).copy(),
            "axis": np.ctypeslib.as_array(r.axis, (k,)).copy(),
            "plane": np.ctypeslib.as_array(r.plane, (k,)).copy(),
            "is_leaf": np.ctypeslib.as_array(r.is_leaf, (k,)).copy().astype(bool),
            "tri_indices": (
                np.ctypeslib.as_array(r.tri_indices, (i,)).copy()
                if i else np.zeros((0,), np.int32)
            ),
            "bbox_min": np.asarray(r.bbox_min[:], np.float32),
            "bbox_max": np.asarray(r.bbox_max[:], np.float32),
        }
    finally:
        lib.kd_free(res)
    return out


class _ObjResult(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("n_positions", ctypes.c_int64),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("n_normals", ctypes.c_int64),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("n_uvs", ctypes.c_int64),
        ("face_pos", ctypes.POINTER(ctypes.c_int32)),
        ("face_uv", ctypes.POINTER(ctypes.c_int32)),
        ("face_nrm", ctypes.POINTER(ctypes.c_int32)),
        ("face_mat", ctypes.POINTER(ctypes.c_int32)),
        ("n_faces", ctypes.c_int64),
        ("mat_names", ctypes.c_char_p),
        ("mat_names_len", ctypes.c_int64),
    ]


def obj_parse_native(path: str):
    """Parse an OBJ file natively; returns dict or None (fallback)."""
    lib = _load("objload")
    if lib is None:
        return None
    lib.obj_parse.restype = ctypes.POINTER(_ObjResult)
    lib.obj_parse.argtypes = [ctypes.c_char_p]
    lib.obj_free.argtypes = [ctypes.POINTER(_ObjResult)]

    res = lib.obj_parse(path.encode())
    if not res:
        raise FileNotFoundError(path)
    try:
        r = res.contents
        f = r.n_faces

        def arr(ptr, n, dtype):
            if n == 0:
                return np.zeros((0,), dtype)
            return np.ctypeslib.as_array(ptr, (n,)).copy()

        names = r.mat_names[: r.mat_names_len].decode() if r.mat_names_len else ""
        out = {
            "positions": arr(r.positions, r.n_positions * 3, np.float32).reshape(-1, 3),
            "normals": arr(r.normals, r.n_normals * 3, np.float32).reshape(-1, 3),
            "uvs": arr(r.uvs, r.n_uvs * 2, np.float32).reshape(-1, 2),
            "face_pos": arr(r.face_pos, f * 3, np.int32).reshape(-1, 3),
            "face_uv": arr(r.face_uv, f * 3, np.int32).reshape(-1, 3),
            "face_nrm": arr(r.face_nrm, f * 3, np.int32).reshape(-1, 3),
            "face_mat": arr(r.face_mat, f, np.int32),
            "mat_names": names.split("\n") if names else [],
        }
    finally:
        lib.obj_free(res)
    return out
