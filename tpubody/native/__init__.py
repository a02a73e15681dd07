"""Native (C++) host-geometry runtime, loaded via ctypes.

Builds on first import (g++ -O3 -shared); every entry point has a pure
Python fallback in the corresponding tpubody module, so the package works
without a compiler.  Use :func:`available` to check.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "geometry.cpp")
_LIB_PATH = os.path.join(_HERE, "_libtpubody_geometry.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64 = ctypes.c_int64
        p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.trace_boundary.restype = i64
        lib.trace_boundary.argtypes = [p_u8, i64, i64, p_i64, i64]
        lib.boundary_ring_walk.restype = i64
        lib.boundary_ring_walk.argtypes = [p_i64, i64, p_i64, i64]
        lib.boundary_edges_from_faces.restype = i64
        lib.boundary_edges_from_faces.argtypes = [p_i64, i64, p_i64, i64]
        lib.dp_backtrack.restype = None
        lib.dp_backtrack.argtypes = [p_i64, i64, i64, i64, p_i64]
        lib.grid_mesh_build.restype = i64
        lib.grid_mesh_build.argtypes = [
            p_u8, p_f32, p_f32, p_f32, i64, i64, i64, i64,
            p_i64, i64, p_f32, i64, ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def trace_boundary(mask: np.ndarray) -> Optional[np.ndarray]:
    """Native Moore tracing; returns (N, 2) (x, y) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray((np.asarray(mask) != 0).astype(np.uint8))
    H, W = m.shape
    cap = 8 * (H + W) + 64
    out = np.empty((cap, 2), np.int64)
    n = lib.trace_boundary(m, H, W, out.reshape(-1), cap)
    while n == -1:  # perimeter larger than the estimate
        cap *= 4
        out = np.empty((cap, 2), np.int64)
        n = lib.trace_boundary(m, H, W, out.reshape(-1), cap)
    return out[:n].copy()


def boundary_ring_walk(edges: np.ndarray) -> Optional[np.ndarray]:
    """Native ordered ring walk over boundary edges (E, 2)."""
    lib = _load()
    if lib is None:
        return None
    e = np.ascontiguousarray(np.asarray(edges, np.int64))
    cap = e.shape[0] + 2
    out = np.empty(cap, np.int64)
    n = lib.boundary_ring_walk(e.reshape(-1), e.shape[0], out, cap)
    if n < 0:
        return None
    return out[:n].copy()


def boundary_edges_from_faces(faces: np.ndarray) -> Optional[np.ndarray]:
    """Once-only (boundary) edges of a triangle mesh: faces (F, 3) int64
    -> (B, 2) int64, or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(np.asarray(faces, np.int64))
    if f.size == 0:
        return np.zeros((0, 2), np.int64)
    # A closed grid mesh has few boundary edges, but be safe: every edge
    # could be once-only (a triangle soup).
    cap = 3 * f.shape[0]
    out = np.empty((cap, 2), np.int64)
    n = lib.boundary_edges_from_faces(f.reshape(-1), f.shape[0],
                                      out.reshape(-1), cap)
    if n < 0:
        return None
    return out[:n].copy()


def grid_mesh_build(mask: np.ndarray, depth: np.ndarray, color: np.ndarray,
                    weights: np.ndarray, is_back: bool
                    ) -> Optional[tuple]:
    """Native grid triangulation + attribute gather.

    mask (H, W) truthy, depth (H, W), color (H, W, 3), weights (H, W, K)
    -> (points (N, 6+K) float32, faces (F, 3) int64), or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray((np.asarray(mask) != 0).astype(np.uint8))
    H, W = m.shape
    d = np.ascontiguousarray(np.asarray(depth, np.float32))
    c = np.ascontiguousarray(np.asarray(color, np.float32))
    w = np.ascontiguousarray(np.asarray(weights, np.float32))
    K = w.shape[2]
    faces_cap = 2 * (H - 1) * (W - 1)
    faces = np.empty((faces_cap, 3), np.int64)
    points = np.empty((H * W, 6 + K), np.float32)
    nv = ctypes.c_int64(0)
    nf = lib.grid_mesh_build(m, d.reshape(-1), c.reshape(-1), w.reshape(-1),
                             H, W, K, int(bool(is_back)),
                             faces.reshape(-1), faces_cap,
                             points.reshape(-1), H * W, ctypes.byref(nv))
    if nf < 0:
        return None
    return points[:nv.value].copy(), faces[:nf].copy()


def dp_backtrack(args: np.ndarray, j_final: int) -> Optional[np.ndarray]:
    """Native DP backtrack; args (m-1, n) argmin table."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(np.asarray(args, np.int64))
    m = a.shape[0] + 1
    out = np.empty(m, np.int64)
    lib.dp_backtrack(a.reshape(-1), m, a.shape[1], int(j_final), out)
    return out
