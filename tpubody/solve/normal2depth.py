"""Normal-map -> depth-map integration by matrix-free conjugate gradient.

The reference assembles a giant sparse finite-difference system and calls
scipy CG (lib/Normal2Depth.py:31-124: A = [Dx; Dy] forward differences over
the full image, b = [-nx/nz; -ny/nz] with normals zeroed outside the mask,
solve AtA z = At b).  At 1024x1024 that is a ~1M-unknown system.

TPU-native redesign: AtA of that stencil is exactly a 5-point Laplacian with
Neumann-style boundaries, so we never build a matrix — the operator is two
shifts and two subtracts per direction, and the solve is
``jax.scipy.sparse.linalg.cg`` with a Jacobi (degree) preconditioner.  The
whole solve is one fused XLA program; front and back integrate in a single
batched CG (leading batch axis), and frames batch with ``vmap``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpubody.image import morphology


def _dx(z: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along x: (..., H, W) -> (..., H, W-1)."""
    return z[..., :, 1:] - z[..., :, :-1]


def _dy(z: jnp.ndarray) -> jnp.ndarray:
    return z[..., 1:, :] - z[..., :-1, :]


def _div_x(g: jnp.ndarray, W: int) -> jnp.ndarray:
    """Adjoint of _dx (negative divergence): out[j] = g[j-1] - g[j],
    g has W-1 columns; out has W."""
    pad = [(0, 0)] * (g.ndim - 1)
    gl = jnp.pad(g, pad + [(1, 0)])   # g[j-1], 0 at j=0
    gr = jnp.pad(g, pad + [(0, 1)])   # g[j],   0 at j=W-1
    return gl - gr


def _div_y(g: jnp.ndarray, H: int) -> jnp.ndarray:
    pad = [(0, 0)] * (g.ndim - 2)
    gl = jnp.pad(g, pad + [(1, 0), (0, 0)])
    gr = jnp.pad(g, pad + [(0, 1), (0, 0)])
    return gl - gr


def laplacian_AtA(z: jnp.ndarray) -> jnp.ndarray:
    """AtA z for A = [Dx; Dy] forward differences (..., H, W)."""
    H, W = z.shape[-2], z.shape[-1]
    return _div_x(_dx(z), W) + _div_y(_dy(z), H)


def _degree(H: int, W: int, dtype) -> jnp.ndarray:
    """diag(AtA): number of difference constraints touching each pixel."""
    deg = jnp.full((H, W), 4.0, dtype)
    deg = deg.at[0, :].add(-1.0).at[-1, :].add(-1.0)
    deg = deg.at[:, 0].add(-1.0).at[:, -1].add(-1.0)
    return deg


def preprocess(normal_img: jnp.ndarray, mask: jnp.ndarray,
               erode_ksize: int = 3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference __init__ semantics (lib/Normal2Depth.py:11-21): erode the
    mask 3x3, map normals from [0,1] to [-1,1], zero them outside the
    (un-eroded) mask."""
    m = (mask > 0)
    eroded = morphology.erode(m, erode_ksize)
    n = normal_img * 2.0 - 1.0
    n = jnp.where(m[..., None], n, 0.0)
    return n, eroded


@functools.partial(jax.jit, static_argnames=("maxiter",))
def integrate(normals: jnp.ndarray, mask: jnp.ndarray,
              maxiter: int = 1500, tol: float = 1e-5) -> jnp.ndarray:
    """Integrate normal map(s) to depth.

    Args:
      normals: (..., H, W, 3) unit-ish normals in [-1, 1], zeroed outside
        the mask (leading axes batch: e.g. (2, H, W, 3) for front+back).
      mask: (H, W) bool; output depth is 0 outside.

    Returns:
      (..., H, W) depth, shifted so min over the batch element is 0 and
      masked (reference lib/Normal2Depth.py:116-122).
    """
    nz = normals[..., 2] + 1e-8
    p = -normals[..., 0] / nz          # target Z(x+1,y) - Z(x,y)
    q = -normals[..., 1] / nz          # target Z(x,y+1) - Z(x,y)

    H, W = mask.shape
    # At b: adjoint applied to the constraint targets (constraints exist for
    # j < W-1 / i < H-1 only).
    Atb = _div_x(p[..., :, :-1], W) + _div_y(q[..., :-1, :], H)

    inv_deg = 1.0 / _degree(H, W, Atb.dtype)

    z = jax.scipy.sparse.linalg.cg(
        laplacian_AtA, Atb, tol=tol, maxiter=maxiter,
        M=lambda r: r * inv_deg,
    )[0]

    reduce_axes = tuple(range(z.ndim - 2, z.ndim))
    z = z - jnp.min(z, axis=reduce_axes, keepdims=True)
    return jnp.where(mask, z, 0.0)


def integrate_front_back(
    normal6: jnp.ndarray, mask: jnp.ndarray,
    maxiter: int = 1500, tol: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Front+back integration in ONE batched CG (the two solves share the
    operator, so they run as a single program — vs the reference's two
    sequential scipy solves, lib/Normal2Depth.py:107-113).

    normal6: (H, W, 6) channels [front nx,ny,nz, back nx,ny,nz] in [-1,1].
    """
    stacked = jnp.stack([normal6[..., 0:3], normal6[..., 3:6]], axis=0)
    depth = integrate(stacked, mask, maxiter=maxiter, tol=tol)
    return depth[0], depth[1]


def align_back_depth(front_depth: jnp.ndarray, back_depth: jnp.ndarray
                     ) -> jnp.ndarray:
    """Shift the back depth into the front depth's frame using silhouette
    boundary statistics (reference deel_back_depth semantics,
    lib/Normal2Depth.py:544-557): subtract the mean boundary offset between
    the two maps, add a third of the front's boundary-vs-interior offset,
    re-mask.  Boundary extraction uses the morphological ring instead of
    cv2 contour tracing (only the ring's mean is consumed)."""
    mask = front_depth > 0
    ring = morphology.boundary(mask, 3)
    nring = jnp.maximum(ring.sum(), 1)
    front_bound_mean = jnp.where(ring, front_depth, 0.0).sum() / nring
    back_bound_mean = jnp.where(ring, back_depth, 0.0).sum() / nring
    front_mean = jnp.mean(front_depth)
    bound_difference = back_bound_mean - front_bound_mean
    front_difference = front_bound_mean - front_mean
    out = back_depth - bound_difference + front_difference / 3.0
    closed = morphology.close(mask, 3)
    return jnp.where(closed, out, 0.0)


def residual_norm(normals: jnp.ndarray, mask: jnp.ndarray,
                  depth: jnp.ndarray) -> jnp.ndarray:
    """Relative residual ||AtA z - At b|| / ||At b|| of a solve — the
    convergence diagnostic the reference ignores (scipy cg's ``info``,
    lib/Normal2Depth.py:109-113; SURVEY.md §5 'failure detection')."""
    nz = normals[..., 2] + 1e-8
    p = -normals[..., 0] / nz
    q = -normals[..., 1] / nz
    H, W = mask.shape
    Atb = _div_x(p[..., :, :-1], W) + _div_y(q[..., :-1, :], H)
    r = laplacian_AtA(depth) - Atb
    axes = tuple(range(r.ndim - 2, r.ndim))
    return (jnp.linalg.norm(r.reshape(*r.shape[:-2], -1), axis=-1)
            / jnp.maximum(jnp.linalg.norm(
                Atb.reshape(*Atb.shape[:-2], -1), axis=-1), 1e-12))


def normal2depth(normal6_img: jnp.ndarray, mask: jnp.ndarray,
                 maxiter: int = 1500, tol: float = 1e-5,
                 align_back: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full stage: [0,1]-encoded 6-channel normal image + mask -> front/back
    depth.  Mirrors Normal2Depth.__init__ + __call__ (lib/Normal2Depth.py:
    11-29)."""
    m = mask > 0
    n6 = normal6_img * 2.0 - 1.0
    n6 = jnp.where(m[..., None], n6, 0.0)
    eroded = morphology.erode(m, 3).astype(bool)
    front, back = integrate_front_back(n6, eroded, maxiter=maxiter, tol=tol)
    if align_back:
        back = align_back_depth(front, back)
    return front, back
