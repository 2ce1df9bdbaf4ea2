"""ctypes bindings for the native host runtime (fbnative.cpp).

Builds the shared library with g++ on first import (cached next to the
source); falls back to `available = False` if no toolchain exists, and the
pure-Python implementations in engine.topology / env.coverage keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fbnative.cpp")
_LIB = os.path.join(_HERE, "libfbnative.so")

available = False
_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.check_call(cmd)


def _load():
    global _lib, available
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        available = False
        return
    lib.fb_load_cloth.restype = ctypes.c_void_p
    lib.fb_load_cloth.argtypes = [ctypes.c_char_p]
    lib.fb_last_error.restype = ctypes.c_char_p
    lib.fb_mesh_counts.restype = ctypes.c_int64
    lib.fb_mesh_counts.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.fb_mesh_fill.restype = ctypes.c_int64
    lib.fb_mesh_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
    lib.fb_mesh_free.argtypes = [ctypes.c_void_p]
    lib.fb_covered_area.restype = ctypes.c_double
    lib.fb_covered_area.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double]
    _lib = lib
    available = True


_load()


def load_cloth(path: str):
    """Native quad-OBJ cloth loader; same contract as
    engine.topology.load_cloth (reference tasks.py:39-102)."""
    assert available, "fbnative not built"
    handle = _lib.fb_load_cloth(path.encode())
    if not handle:
        raise ValueError(_lib.fb_last_error().decode())
    try:
        counts = (ctypes.c_int64 * 5)()
        _lib.fb_mesh_counts(handle, counts)
        v, t, s, b, h = (int(c) for c in counts)
        verts = np.empty((v, 3), np.float64)
        tris = np.empty((t, 3), np.int64)
        stretch = np.empty((s, 2), np.int64)
        bend = np.empty((b, 2), np.int64)
        shear = np.empty((h, 2), np.int64)
        _lib.fb_mesh_fill(
            handle,
            verts.ctypes.data_as(ctypes.c_void_p),
            tris.ctypes.data_as(ctypes.c_void_p),
            stretch.ctypes.data_as(ctypes.c_void_p),
            bend.ctypes.data_as(ctypes.c_void_p),
            shear.ctypes.data_as(ctypes.c_void_p),
        )
        return verts, tris, stretch, bend, shear
    finally:
        _lib.fb_mesh_free(handle)


def covered_area(positions: np.ndarray, radius: float = 0.00625) -> float:
    """Reference-exact covered area; positions (N, 3) or (N, 4) float32."""
    assert available, "fbnative not built"
    pos = np.ascontiguousarray(positions, np.float32)
    n, stride = pos.shape[0], pos.shape[1]
    return float(_lib.fb_covered_area(
        pos.ctypes.data_as(ctypes.c_void_p), n, stride, radius))
