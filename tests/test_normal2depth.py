import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.solve import normal2depth as n2d
from tpubody.image import morphology
from tests.oracle.np_normal2depth import integrate_np


def _sphere_cap(H=40, W=40, r=16.0):
    """Synthetic hemisphere depth + exact analytic normals + mask."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cx, cy = W / 2, H / 2
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    mask = d2 < (r * 0.85) ** 2
    depth = np.where(mask, -np.sqrt(np.maximum(r ** 2 - d2, 1e-9)), 0.0)
    # Surface z(x, y): normal ∝ (-dz/dx, -dz/dy, 1).
    gx = (xx - cx) / np.maximum(np.sqrt(np.maximum(r ** 2 - d2, 1e-9)), 1e-6)
    gy = (yy - cy) / np.maximum(np.sqrt(np.maximum(r ** 2 - d2, 1e-9)), 1e-6)
    nz = 1.0 / np.sqrt(1 + gx ** 2 + gy ** 2)
    nx = -gx * nz
    ny = -gy * nz
    normals = np.stack([nx, ny, nz], axis=-1)
    normals[~mask] = 0.0
    return normals, mask, depth


def test_adjoint_property():
    """<Dx z, g> == <z, Dx^T g> — the operator pair must be exact adjoints."""
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(9, 11)))
    g = jnp.asarray(rng.normal(size=(9, 10)))
    lhs = float(jnp.sum(n2d._dx(z) * g))
    rhs = float(jnp.sum(z * n2d._div_x(g, 11)))
    assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0)
    gy = jnp.asarray(rng.normal(size=(8, 11)))
    lhs = float(jnp.sum(n2d._dy(z) * gy))
    rhs = float(jnp.sum(z * n2d._div_y(gy, 9)))
    assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0)


def test_laplacian_matches_oracle_assembly():
    """Matrix-free AtA equals the explicitly assembled normal equations."""
    import scipy.sparse as sp
    H, W = 7, 6
    rows, cols, vals = [], [], []
    r = 0
    for i in range(H):
        for j in range(W - 1):
            rows += [r, r]; cols += [i * W + j, i * W + j + 1]
            vals += [-1.0, 1.0]; r += 1
    for i in range(H - 1):
        for j in range(W):
            rows += [r, r]; cols += [i * W + j, (i + 1) * W + j]
            vals += [-1.0, 1.0]; r += 1
    A = sp.csr_matrix((vals, (rows, cols)), shape=(r, H * W))
    AtA = (A.T @ A).toarray()
    rng = np.random.default_rng(1)
    z = rng.normal(size=(H, W))
    want = (AtA @ z.ravel()).reshape(H, W)
    got = np.asarray(n2d.laplacian_AtA(jnp.asarray(z)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_integrate_recovers_sphere():
    normals, mask, depth_gt = _sphere_cap()
    got = np.asarray(n2d.integrate(
        jnp.asarray(normals, jnp.float32), jnp.asarray(mask), maxiter=2000))
    # Depth recovered up to a constant inside the mask; compare shifted.
    interior = np.asarray(morphology.erode(jnp.asarray(mask), 5)).astype(bool)
    g = got[interior] - got[interior].mean()
    w = depth_gt[interior] - depth_gt[interior].mean()
    err = np.abs(g - w).max()
    # Boundary pixels fight the flat surround (constraints cross the mask
    # edge — inherent to the reference formulation as well); ~3% of radius.
    assert err < 0.6, f"max abs depth err {err}"
    # The formulation's boundary leakage caps analytic agreement at ~0.984
    # (the scipy oracle scores identically; exact parity with the oracle is
    # asserted in test_matches_scipy_oracle).
    corr = np.corrcoef(g, w)[0, 1]
    assert corr > 0.98


def test_matches_scipy_oracle():
    # Jacobi preconditioning: on this tiny grid it converges exactly and its
    # XLA:CPU compile is ~1 s where the V-cycle's is ~20 s; the mg-path
    # oracle comparison is the slow-marked variant below.
    normals, mask, _ = _sphere_cap(H=24, W=20, r=9.0)
    ref = integrate_np(normals, mask)
    got = np.asarray(n2d.integrate(
        jnp.asarray(normals, jnp.float32), jnp.asarray(mask), maxiter=4000,
        tol=1e-6, precond="jacobi"))
    m = mask
    # Compare up to the min-shift ambiguity: both are min-shifted already.
    err = np.abs(got[m] - ref[m]).max()
    assert err < 5e-2, f"max err vs scipy oracle {err}"


@pytest.mark.slow
def test_matches_scipy_oracle_multigrid():
    """Same oracle gate through the production multigrid path."""
    normals, mask, _ = _sphere_cap(H=24, W=20, r=9.0)
    ref = integrate_np(normals, mask)
    got = np.asarray(n2d.integrate(
        jnp.asarray(normals, jnp.float32), jnp.asarray(mask), maxiter=1500,
        tol=1e-6))
    err = np.abs(got[mask] - ref[mask]).max()
    assert err < 5e-2, f"max err vs scipy oracle {err}"


@pytest.mark.slow
def test_front_back_batched():
    normals, mask, _ = _sphere_cap(H=24, W=20, r=9.0)
    n6 = np.concatenate([normals, normals * np.array([1, 1, -1])], axis=-1)
    # encode to [0,1] image form as the pipeline provides
    img = (n6 + 1.0) / 2.0
    img[~mask] = 0.5
    f, b = n2d.normal2depth(jnp.asarray(img, jnp.float32), jnp.asarray(mask))
    assert np.isfinite(np.asarray(f)).all() and np.isfinite(np.asarray(b)).all()
    assert (np.asarray(f)[~mask] == 0).all()


@pytest.mark.slow
def test_align_back_depth_shifts_to_front_frame():
    normals, mask, _ = _sphere_cap(H=30, W=30, r=12.0)
    front = np.asarray(n2d.integrate(
        jnp.asarray(normals, jnp.float32), jnp.asarray(mask), maxiter=2000))
    back = front + 7.0  # grossly offset back map
    back[~mask] = 0.0
    aligned = np.asarray(n2d.align_back_depth(
        jnp.asarray(front), jnp.asarray(back)))
    ring = np.asarray(morphology.boundary(jnp.asarray(front > 0), 3))
    # After alignment, boundary means are close (within the /3 interior term).
    fb = front[ring].mean()
    ab = aligned[ring].mean()
    assert abs(ab - fb) < abs((back[ring]).mean() - fb)


def test_morphology_basics():
    m = np.zeros((11, 11), bool)
    m[3:8, 3:8] = True
    er = np.asarray(morphology.erode(jnp.asarray(m), 3))
    assert er.sum() == 9  # 5x5 -> 3x3
    di = np.asarray(morphology.dilate(jnp.asarray(m), 3))
    assert di.sum() == 49  # 5x5 -> 7x7
    cl = np.asarray(morphology.close(jnp.asarray(m), 3))
    np.testing.assert_array_equal(cl, m)
    ring = np.asarray(morphology.boundary(jnp.asarray(m), 3))
    assert ring.sum() == 25 - 9


def test_median_blur_removes_salt():
    rng = np.random.default_rng(2)
    img = np.ones((16, 16))
    img[5, 5] = 100.0
    out = np.asarray(morphology.median_blur(jnp.asarray(img), 3))
    assert out.max() < 2.0


def test_residual_norm_diagnostic():
    """Converged solve has small relative residual; garbage depth doesn't.

    The diagnostic applies to the raw (unmasked) solution field — masking
    zeroes the exterior and would dominate the residual — so solve with an
    all-true mask here."""
    normals, mask, _ = _sphere_cap(H=24, W=20, r=9.0)
    full = jnp.ones_like(jnp.asarray(mask))
    n = jnp.asarray(normals, jnp.float32)
    # jacobi: the diagnostic is preconditioner-agnostic and this skips the
    # V-cycle's ~20 s XLA:CPU compile in the fast set.
    depth = n2d.integrate(n, full, maxiter=6000, tol=1e-8, precond="jacobi")
    good = float(n2d.residual_norm(n, full, depth))
    rng_bad = jnp.asarray(
        np.random.default_rng(0).normal(size=depth.shape), jnp.float32)
    bad = float(n2d.residual_norm(n, full, rng_bad))
    assert good < 1e-2
    assert bad > 10 * good


class TestMultigrid:
    """The V-cycle preconditioner (make_mg_preconditioner) must be a
    symmetric PSD operator for CG, and must beat Jacobi on iteration count
    (its whole reason to exist — SURVEY.md §7 hard part 6)."""

    def test_vcycle_symmetric_psd(self):
        H, W = 40, 52   # padding path: 52 is not a multiple of 2^levels
        M = n2d.make_mg_preconditioner(H, W)
        rng = np.random.default_rng(0)
        r1 = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
        r2 = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
        lhs = float(jnp.sum(M(r1) * r2))
        rhs = float(jnp.sum(r1 * M(r2)))
        assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0)
        assert float(jnp.sum(r1 * M(r1))) > 0
        assert float(jnp.sum(r2 * M(r2))) > 0

    @pytest.mark.slow
    def test_mg_beats_jacobi_iterations(self):
        H, W = 64, 64
        rng = np.random.default_rng(1)
        z_true = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
        b = n2d.laplacian_AtA(z_true)
        M = n2d.make_mg_preconditioner(H, W)
        zm, km, resm = n2d.pcg(b, M, tol=1e-6, maxiter=2000)
        Mj = lambda r: r / n2d._degree(H, W, r.dtype)  # noqa: E731
        zj, kj, resj = n2d.pcg(b, Mj, tol=1e-6, maxiter=2000)
        assert float(resm) < 1e-5
        assert int(km) * 5 < int(kj), (int(km), int(kj))
        zm = np.asarray(zm); zt = np.asarray(z_true)
        np.testing.assert_allclose(zm - zm.mean(), zt - zt.mean(), atol=1e-3)

    @pytest.mark.slow
    def test_pcg_noise_floor_guard(self):
        """Requesting an unreachable f32 tolerance must NOT blow up the
        solution (CG past the rounding floor diverges without the best-
        iterate/divergence guards)."""
        normals, mask, _ = _sphere_cap(H=24, W=20, r=9.0)
        n = jnp.asarray(normals, jnp.float32)
        H, W = mask.shape
        nz = n[..., 2] + 1e-8
        Atb = (n2d._div_x((-n[..., 0] / nz)[..., :, :-1], W)
               + n2d._div_y((-n[..., 1] / nz)[..., :-1, :], H))
        M = n2d.make_mg_preconditioner(H, W)
        z, k, res = n2d.pcg(Atb, M, tol=1e-12, maxiter=3000)
        assert np.isfinite(np.asarray(z)).all()
        assert float(jnp.abs(z).max()) < 1e3
        assert float(res) < 1e-4
