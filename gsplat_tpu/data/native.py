"""ctypes bindings for the native IO core (native/gsplat_io.cpp).

Builds lazily with `make -C native` on first use if g++ is available; every
entry point has a pure-python fallback (data/ply.py, data/colmap.py), so the
framework works without a toolchain — the native path is the production fast
path for large scenes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgsplat_io.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.colmap_points3d_read.restype = ctypes.c_int64
    lib.colmap_points3d_read.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.colmap_images_read.restype = ctypes.c_int64
    lib.colmap_images_read.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.ply_vertex_read.restype = ctypes.c_int64
    lib.ply_vertex_read.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p]
    lib.ply_vertex_write.restype = ctypes.c_int64
    lib.ply_vertex_write.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _names_buf(names: List[str]) -> bytes:
    return b"".join(n.encode() + b"\0" for n in names)


def read_points3d_binary(path: str) -> Optional[Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    n = lib.colmap_points3d_read(path.encode(), None, None, None)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float32)
    r = lib.colmap_points3d_read(
        path.encode(), xyz.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p),
        err.ctypes.data_as(ctypes.c_void_p))
    if r != n:
        return None
    return xyz.astype(np.float64), rgb.astype(np.float64), err[:, None].astype(np.float64)


def read_images_binary_meta(path: str):
    """-> (ids, qvec [n,4], tvec [n,3], camera_ids, names) or None."""
    lib = _load()
    if lib is None:
        return None
    nb = ctypes.c_int64(0)
    n = lib.colmap_images_read(path.encode(), None, None, None, None, None,
                               ctypes.byref(nb))
    if n < 0:
        return None
    ids = np.empty(n, np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cams = np.empty(n, np.int32)
    names = ctypes.create_string_buffer(nb.value)
    r = lib.colmap_images_read(
        path.encode(), ids.ctypes.data_as(ctypes.c_void_p),
        qvec.ctypes.data_as(ctypes.c_void_p),
        tvec.ctypes.data_as(ctypes.c_void_p),
        cams.ctypes.data_as(ctypes.c_void_p), names, ctypes.byref(nb))
    if r != n:
        return None
    name_list = bytes(names.raw).split(b"\0")[:n]
    return ids, qvec, tvec, cams, [s.decode() for s in name_list]


def ply_read_props(path: str, names: List[str]) -> Optional[np.ndarray]:
    """Read named vertex properties -> [n, len(names)] float32, or None."""
    lib = _load()
    if lib is None:
        return None
    n = lib.ply_vertex_read(path.encode(), _names_buf(names), len(names), None)
    if n < 0:
        return None
    out = np.empty((n, len(names)), np.float32)
    r = lib.ply_vertex_read(path.encode(), _names_buf(names), len(names),
                            out.ctypes.data_as(ctypes.c_void_p))
    if r != n:
        return None
    return out


def ply_write_props(path: str, names: List[str], data: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float32)
    r = lib.ply_vertex_write(path.encode(), _names_buf(names), len(names),
                             data.ctypes.data_as(ctypes.c_void_p),
                             data.shape[0])
    return r == data.shape[0]
