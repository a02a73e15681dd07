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


# ---------------------------------------------------------------------------
# Geometric multigrid preconditioner.
#
# The 5-point Laplacian's condition number grows like (N/pi)^2, so plain
# Jacobi-PCG needs ~1500 iterations at 1024^2 (the reference's scipy CG
# never converges there either — lib/Normal2Depth.py:107-113 caps maxiter
# and ignores `info`).  A V-cycle drops that to a few dozen.  Everything in
# the cycle is a shift/add or a 2x2 reshape-reduce — ideal VPU work, and the
# whole PCG still compiles to one XLA program.
#
# Symmetry (required for CG): smoothing is damped Richardson
# z += alpha*(b - A z) (alpha = 0.2 = the classic 4/5 * 1/diag damping for
# the 2D stencil), which is a symmetric polynomial in A; prolongation P is
# piecewise-constant 2x2 injection and restriction is 0.5 * P^T (2x2 sum),
# which makes the rediscretized unit-spacing coarse Laplacian EXACTLY the
# Galerkin operator P^T A P / 2 in the interior; equal pre/post smoothing
# closes the M = S(I + 0.5 P B P^T)S form, so M is symmetric PSD.
# ---------------------------------------------------------------------------


def _restrict(r: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (2x2 block sum): the Galerkin-consistent restriction."""
    Hc, Wc = r.shape[-2] // 2, r.shape[-1] // 2
    return 0.5 * r.reshape(*r.shape[:-2], Hc, 2, Wc, 2).sum(axis=(-3, -1))


def _prolong(e: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-constant 2x2 injection (adjoint of 2x2 sum)."""
    return jnp.repeat(jnp.repeat(e, 2, axis=-2), 2, axis=-1)


def make_mg_preconditioner(H: int, W: int, levels: Optional[int] = None,
                           nu: int = 2, alpha: float = 0.2,
                           coarse_iters: int = 32):
    """Return M(r) ~= AtA^{-1} r: one symmetric V(nu,nu)-cycle.

    Non-power-of-two sizes are zero-padded to a multiple of 2^levels inside
    the cycle (M = E^T M_pad E keeps symmetry)."""
    if levels is None:
        levels = 0
        while (min(H, W) >> (levels + 1)) >= 8 and levels < 7:
            levels += 1
    if levels == 0:
        def jacobi(r):
            return r / _degree(H, W, r.dtype)
        return jacobi
    m = 1 << levels
    Hp = -(-H // m) * m
    Wp = -(-W // m) * m

    def smooth(z, b, n):
        for _ in range(n):
            z = z + alpha * (b - laplacian_AtA(z))
        return z

    def vcycle(b, level):
        if level == levels:
            return smooth(jnp.zeros_like(b), b, coarse_iters)
        z = smooth(jnp.zeros_like(b), b, nu)
        r = b - laplacian_AtA(z)
        z = z + _prolong(vcycle(_restrict(r), level + 1))
        return smooth(z, b, nu)

    def M(r):
        pad = [(0, 0)] * (r.ndim - 2) + [(0, Hp - H), (0, Wp - W)]
        return vcycle(jnp.pad(r, pad), 0)[..., :H, :W]

    return M


def pcg(b: jnp.ndarray, M, tol: float = 1e-5, maxiter: int = 200
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Preconditioned CG on AtA z = b (whole-array inner products, so a
    batched b solves as one joint Krylov space — front+back in one program).

    Returns (z, iterations_used, relative_residual) — the convergence
    diagnostics the reference discards (SURVEY.md §5 'failure detection').

    AtA is singular (constant nullspace per (H, W) slice), so the constant
    mode is deflated: b and every preconditioned residual are projected to
    zero mean.  Without this the V-cycle injects an arbitrary constant each
    iteration and the growing offset burns float32 mantissa."""
    def deflate(x):
        return x - jnp.mean(x, axis=(-2, -1), keepdims=True)

    b = deflate(b)
    bnorm2 = jnp.vdot(b, b).real
    # Floor the tolerance at what the dtype can actually reach: asking f32
    # CG for 1e-8 makes it iterate on rounding noise, where aggressively
    # preconditioned search directions AMPLIFY the noise and z diverges.
    eps = jnp.finfo(b.dtype).eps
    atol2 = jnp.maximum(tol * tol, 16.0 * eps * eps) * bnorm2

    z0 = jnp.zeros_like(b)
    r0 = b
    p0 = deflate(M(r0))
    rho0 = jnp.vdot(r0, p0).real
    rn0 = bnorm2

    def cond(state):
        _, r, _, _, k, _, best_rn = state
        rn = jnp.vdot(r, r).real
        diverged = rn > 100.0 * best_rn          # iterating on noise
        return (rn > atol2) & (k < maxiter) & (k >= 0) & ~diverged

    def body(state):
        z, r, p, rho, k, best_z, best_rn = state
        Ap = laplacian_AtA(p)
        pAp = jnp.vdot(p, Ap).real
        # 0/0 guard at exact stagnation; flag exit via k < 0.
        ok = (pAp > 1e-30) & jnp.isfinite(pAp)
        a = jnp.where(ok, rho / jnp.where(ok, pAp, 1.0), 0.0)
        z = z + a * p
        r = r - a * Ap
        rn = jnp.vdot(r, r).real
        better = rn < best_rn
        best_z = jnp.where(better, z, best_z)
        best_rn = jnp.where(better, rn, best_rn)
        y = deflate(M(r))
        rho_new = jnp.vdot(r, y).real
        beta = jnp.where(rho > 1e-30, rho_new / jnp.where(rho > 1e-30,
                                                          rho, 1.0), 0.0)
        p = y + beta * p
        k_next = jnp.where(ok, k + 1, -(k + 1))
        return z, r, p, rho_new, k_next, best_z, best_rn

    _, _, _, _, k, z, rn = jax.lax.while_loop(
        cond, body, (z0, r0, p0, rho0, 0, z0, rn0))
    k = jnp.abs(k)
    relres = jnp.sqrt(rn / jnp.maximum(bnorm2, 1e-30))
    return z, k, relres


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


@functools.partial(jax.jit, static_argnames=("precond",))
def integrate(normals: jnp.ndarray, mask: jnp.ndarray,
              maxiter: int = 1500, tol: float = 1e-5,
              precond: str = "mg") -> jnp.ndarray:
    """Integrate normal map(s) to depth.

    Args:
      normals: (..., H, W, 3) unit-ish normals in [-1, 1], zeroed outside
        the mask (leading axes batch: e.g. (2, H, W, 3) for front+back).
      mask: (H, W) bool; output depth is 0 outside.
      precond: "mg" (multigrid V-cycle, ~30x fewer iterations at 1024^2)
        or "jacobi".

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

    if precond == "mg":
        M = make_mg_preconditioner(H, W)
    else:
        inv_deg = 1.0 / _degree(H, W, Atb.dtype)
        M = lambda r: r * inv_deg  # noqa: E731
    z, _, _ = pcg(Atb, M, tol=tol, maxiter=maxiter)

    reduce_axes = tuple(range(z.ndim - 2, z.ndim))
    z = z - jnp.min(z, axis=reduce_axes, keepdims=True)
    return jnp.where(mask, z, 0.0)


def integrate_front_back(
    normal6: jnp.ndarray, mask: jnp.ndarray,
    maxiter: int = 1500, tol: float = 1e-5, precond: str = "mg",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Front+back integration in ONE batched CG (the two solves share the
    operator, so they run as a single program — vs the reference's two
    sequential scipy solves, lib/Normal2Depth.py:107-113).

    normal6: (H, W, 6) channels [front nx,ny,nz, back nx,ny,nz] in [-1,1].
    """
    stacked = jnp.stack([normal6[..., 0:3], normal6[..., 3:6]], axis=0)
    depth = integrate(stacked, mask, maxiter=maxiter, tol=tol,
                      precond=precond)
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
