"""Scipy sparse oracle for normal->depth integration (small images).

Independently assembles the same least-squares system the reference solves
(forward differences right+down over the full grid, b = -nx/nz, -ny/nz with
normals zeroed outside the mask) and solves the normal equations exactly
with a direct sparse solver.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg


def integrate_np(normals: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """normals (H,W,3) in [-1,1] zeroed outside mask; mask (H,W) bool.
    Returns depth (H,W), min-shifted and masked."""
    H, W = mask.shape
    n = mask.size

    def idx(i, j):
        return i * W + j

    rows, cols, vals, bvals = [], [], [], []
    p = -normals[..., 0] / (normals[..., 2] + 1e-8)
    q = -normals[..., 1] / (normals[..., 2] + 1e-8)
    r = 0
    for i in range(H):
        for j in range(W - 1):
            rows += [r, r]
            cols += [idx(i, j), idx(i, j + 1)]
            vals += [-1.0, 1.0]
            bvals.append(p[i, j])
            r += 1
    for i in range(H - 1):
        for j in range(W):
            rows += [r, r]
            cols += [idx(i, j), idx(i + 1, j)]
            vals += [-1.0, 1.0]
            bvals.append(q[i, j])
            r += 1

    A = sp.csr_matrix((vals, (rows, cols)), shape=(r, n))
    b = np.asarray(bvals)
    AtA = (A.T @ A).tocsc()
    Atb = A.T @ b
    # The system is singular (constant nullspace); pin it with a tiny ridge.
    z = sp.linalg.spsolve(AtA + 1e-10 * sp.eye(n), Atb)
    depth = z.reshape(H, W)
    depth -= depth.min()
    depth[~mask] = 0.0
    return depth
