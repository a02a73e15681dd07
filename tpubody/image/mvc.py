"""Mean-value coordinates of 2D points w.r.t. a closed polygon, batched.

Capability parity with the reference's vectorized MVC
(lib/Warp.py:477-548 get_one/get_mult_mv_coordinate, and the scalar
lib/reconstruct/meanvaluecoordinates.py F): Floater's tan(alpha/2) weights

    w_i = (tan(a_{i-1}/2) + tan(a_i/2)) / |v_i - p|,
    tan(a_i/2) = cross(d_i, d_{i+1}) / (|d_i||d_{i+1}| + dot(d_i, d_{i+1}))

with the two degenerate cases (p exactly on a vertex; p on an edge) folded
in branch-free with ``jnp.where`` so the whole thing jits and vmaps.  One
(m, n) broadcast + row-normalize; the warp displacement is then a single
(m, n) x (n, 2) matmul — MXU work, no chunking needed on TPU
(the reference chunks at 100k points on host, lib/Warp.py:209-214).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


@jax.jit
def mean_value_coordinates(pts: jnp.ndarray, poly: jnp.ndarray) -> jnp.ndarray:
    """MVC weights of each point w.r.t. the polygon.

    Args:
      pts: (m, 2) query points.
      poly: (n, 2) closed polygon vertices (ordered; wrap-around implied).

    Returns:
      (m, n) weights, rows summing to 1.
    """
    pts = pts.astype(jnp.float32)
    poly = poly.astype(jnp.float32)
    d = poly[None, :, :] - pts[:, None, :]          # (m, n, 2)
    dn = jnp.roll(d, -1, axis=1)                    # next vertex
    r = jnp.linalg.norm(d, axis=2)                  # (m, n)
    rn = jnp.roll(r, -1, axis=1)

    det = d[..., 0] * dn[..., 1] - d[..., 1] * dn[..., 0]   # cross
    dot = jnp.sum(d * dn, axis=2)

    # General case: Floater weights.
    tan_half = det / jnp.where(
        jnp.abs(r * rn + dot) < _EPS, _EPS, r * rn + dot)
    w = (jnp.roll(tan_half, 1, axis=1) + tan_half) / jnp.maximum(r, _EPS)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    w = w / jnp.where(jnp.abs(wsum) < _EPS, _EPS, wsum)

    # Case: p coincides with a vertex -> delta weights.
    on_vertex = r < 1e-6                            # (m, n)
    any_vertex = jnp.any(on_vertex, axis=1, keepdims=True)
    w_vertex = on_vertex.astype(w.dtype)
    w_vertex = w_vertex / jnp.maximum(
        jnp.sum(w_vertex, axis=1, keepdims=True), _EPS)

    # Case: p on an edge (colinear between v_i, v_{i+1}: det==0, dot<0)
    # -> linear interpolation between that edge's endpoints.
    on_edge = (jnp.abs(det) < 1e-9) & (dot < 0)
    any_edge = jnp.any(on_edge, axis=1, keepdims=True)
    edge_w_i = rn / jnp.maximum(r + rn, _EPS)       # weight for v_i
    edge_w_n = r / jnp.maximum(r + rn, _EPS)        # weight for v_{i+1}
    w_edge = jnp.where(on_edge, edge_w_i, 0.0)
    w_edge = w_edge + jnp.roll(jnp.where(on_edge, edge_w_n, 0.0), 1, axis=1)
    w_edge = w_edge / jnp.maximum(jnp.sum(w_edge, axis=1, keepdims=True), _EPS)

    w = jnp.where(any_edge, w_edge, w)
    w = jnp.where(any_vertex, w_vertex, w)
    return w


@jax.jit
def warp_points(pts: jnp.ndarray, src_poly: jnp.ndarray,
                dst_poly: jnp.ndarray) -> jnp.ndarray:
    """Transport points from the source polygon's frame to the target's:
    weights = MVC(pts, src_poly); out = weights @ dst_poly
    (reference get_corres, lib/Warp.py:199-218)."""
    w = mean_value_coordinates(pts, src_poly)
    return jnp.einsum(
        "mn,nc->mc", w, dst_poly.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("chunk",))
def warp_points_chunked(pts: jnp.ndarray, src_poly: jnp.ndarray,
                        dst_poly: jnp.ndarray,
                        chunk: int = 16384) -> jnp.ndarray:
    """Memory-bounded warp for full-resolution images.

    At 1024^2 the (m, n) MVC broadcast is ~250k x boundary-length — several
    GB of intermediates.  This pads m to a chunk multiple and ``lax.map``s
    the transport over fixed-size chunks, so peak memory is
    O(chunk * n) while everything stays one compiled program (the
    reference hand-chunks at 100k points on host, lib/Warp.py:209-214).
    """
    m = pts.shape[0]
    pad = (-m) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    blocks = pts_p.reshape(-1, chunk, 2)
    out = jax.lax.map(lambda b: warp_points(b, src_poly, dst_poly), blocks)
    return out.reshape(-1, 2)[:m]
