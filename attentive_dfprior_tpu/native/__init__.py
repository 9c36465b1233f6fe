"""ctypes bindings for the native (C++) runtime components.

Builds ``libdfprior_native.so`` on first use (g++, see Makefile) and exposes:
  - ``rasterize_depth``: z-buffer mesh depth rendering (eval pipelines)
  - ``marching_tets``: fast iso-surface extraction (same algorithm as the
    numpy golden in utils/marching_cubes.py)

If the toolchain is unavailable the callers fall back to the numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdfprior_native.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None

    lib.rasterize_depth.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mt_run.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
    ]
    lib.mt_num_verts.restype = ctypes.c_int64
    lib.mt_num_faces.restype = ctypes.c_int64
    lib.mt_get.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64)
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def rasterize_depth(
    verts: np.ndarray,
    faces: np.ndarray,
    w2c: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    H: int,
    W: int,
) -> np.ndarray:
    """Render the mesh's depth map from a camera (OpenCV convention, +z fwd).

    Returns (H, W) float32 depth; 0 where no geometry.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++/make missing?)")
    v = np.ascontiguousarray(verts, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    m = np.ascontiguousarray(w2c, dtype=np.float32).reshape(-1)
    out = np.zeros((H, W), dtype=np.float32)
    lib.rasterize_depth(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fx, fy, cx, cy, H, W,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def marching_tets(
    volume: np.ndarray, level: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Native iso-surface extraction; returns (verts index-space, faces)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    vol = np.ascontiguousarray(volume, dtype=np.float64)
    X, Y, Z = vol.shape
    lib.mt_run(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), X, Y, Z, level
    )
    nv = lib.mt_num_verts()
    nf = lib.mt_num_faces()
    verts = np.empty((nv, 3), dtype=np.float64)
    faces = np.empty((nf, 3), dtype=np.int64)
    lib.mt_get(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return verts, faces
