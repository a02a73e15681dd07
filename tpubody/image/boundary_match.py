"""Monotone boundary correspondence by dynamic programming (jit/scan).

Capability parity with the reference's DP boundary match
(lib/Warp.py:99-165): given two ordered silhouette contours, assign each
photo-boundary point a SMPL-boundary point such that indices advance
monotonically (window k) and total point distance is minimal.

TPU-first redesign: instead of the reference's O(m*n) *python* loop over
tuple lists, the DP is a ``lax.scan`` over photo points whose carried state
is the whole cost row — each step is a vectorized windowed-min + distance
add (O(n*k) flops on the VPU, no host round-trips).  Backtracking carries
the argmin table out of the scan and walks it with a second scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e12


def _windowed_min(row: jnp.ndarray, k: int):
    """For each j: min over j' in [j-k, j-1] of row[j'], plus its argmin.

    Implemented as a stack of k shifted copies -> min over the new axis —
    vectorized, no data-dependent control flow.
    """
    n = row.shape[0]
    shifts = []
    for s in range(1, k + 1):
        shifted = jnp.concatenate([jnp.full((s,), _INF, row.dtype), row[:n - s]])
        shifts.append(shifted)
    stack = jnp.stack(shifts, axis=0)              # (k, n)
    best = jnp.min(stack, axis=0)
    off = jnp.argmin(stack, axis=0) + 1            # shift distance 1..k
    idx = jnp.arange(n) - off
    return best, idx


@functools.partial(jax.jit, static_argnames=("k",))
def _dp_tables(dist: jnp.ndarray, k: int):
    """dist: (m, n) photo-to-smpl distances.  Returns the (m, n) argmin
    backpointer table and the final cost row."""

    def step(carry, d_row):
        prev_row = carry
        best, arg = _windowed_min(prev_row, k)
        new_row = d_row + best
        return new_row, arg

    init = dist[0]
    final_row, args = jax.lax.scan(step, init, dist[1:])
    return final_row, args


def match_boundaries(
    smpl_bound: np.ndarray,   # (n, 2) ordered SMPL silhouette points
    rgb_bound: np.ndarray,    # (m, 2) ordered photo silhouette points
    k: int = 64,
) -> np.ndarray:
    """Match each photo boundary point to a SMPL boundary point.

    Both contours must start near corresponding locations (they are traced
    from the same scan order, so they do).  Returns (m,) indices into
    ``smpl_bound``, monotonically non-decreasing (window ``k``).
    """
    sb = jnp.asarray(smpl_bound, jnp.float32)
    rb = jnp.asarray(rgb_bound, jnp.float32)
    # Pairwise distance via the |a|^2 - 2ab + |b|^2 expansion (one matmul).
    d2 = (jnp.sum(rb ** 2, axis=1)[:, None]
          - 2.0 * rb @ sb.T
          + jnp.sum(sb ** 2, axis=1)[None, :])
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))

    final_row, args = _dp_tables(dist, k)
    m = rb.shape[0]

    # Backtrack (host-sequential; native C++ when built, Python fallback).
    args_np = np.asarray(args)                     # (m-1, n)
    j = int(np.argmin(np.asarray(final_row)))

    from tpubody import native
    match = native.dp_backtrack(args_np, j)
    if match is None:
        out = [j]
        for i in range(m - 2, -1, -1):
            j = int(args_np[i, j])
            out.append(j)
        match = np.asarray(out[::-1], np.int64)
    return np.clip(match, 0, smpl_bound.shape[0] - 1)
