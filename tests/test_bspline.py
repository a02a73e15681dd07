import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.mesh import bspline


class TestCurve:
    def test_interpolation_property(self):
        """The fitted curve passes exactly through the input points."""
        rng = np.random.default_rng(0)
        pts = jnp.asarray(np.cumsum(rng.normal(size=(9, 3)), axis=0),
                          jnp.float32)
        curve = bspline.interpolate_curve(pts, degree=3)
        t = bspline.chord_length_params(pts)
        B = bspline.basis_matrix(t, curve.knots, curve.degree,
                                 curve.control.shape[0])
        recon = np.asarray(B @ curve.control)
        np.testing.assert_allclose(recon, np.asarray(pts), atol=2e-4)

    def test_endpoints_exact(self):
        pts = jnp.asarray([[0, 0, 0], [1, 2, 0], [3, 1, 0], [4, 4, 0]],
                          jnp.float32)
        out = np.asarray(bspline.fit_curve_points(pts, 3, 20))
        np.testing.assert_allclose(out[0], [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(out[-1], [4, 4, 0], atol=1e-5)

    def test_linear_precision(self):
        """Collinear input points -> all samples stay on the line."""
        t = np.linspace(0, 1, 7)[:, None]
        pts = jnp.asarray(t * np.array([[2.0, -1.0, 3.0]]), jnp.float32)
        out = np.asarray(bspline.fit_curve_points(pts, 3, 33))
        d = np.array([2.0, -1.0, 3.0])
        d /= np.linalg.norm(d)
        resid = out - np.outer(out @ d, d)
        assert np.abs(resid).max() < 1e-4

    def test_partition_of_unity(self):
        pts = jnp.asarray(np.random.default_rng(1).normal(size=(8, 2)),
                          jnp.float32)
        curve = bspline.interpolate_curve(pts, 3)
        u = jnp.linspace(0, 1, 50)
        B = np.asarray(bspline.basis_matrix(u, curve.knots, 3, 8))
        np.testing.assert_allclose(B.sum(1), 1.0, atol=1e-5)
        assert (B >= -1e-6).all()

    def test_degree_clamped_for_few_points(self):
        pts = jnp.asarray([[0, 0], [1, 1], [2, 0]], jnp.float32)
        out = np.asarray(bspline.fit_curve_points(pts, 3, 10))  # degree -> 2
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[0], [0, 0], atol=1e-5)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.normal(size=(5, 7, 3)).cumsum(axis=1),
                          jnp.float32)
        batch = np.asarray(bspline.fit_curves_batch(pts, 2, 15))
        for i in range(5):
            single = np.asarray(bspline.fit_curve_points(pts[i], 2, 15))
            np.testing.assert_allclose(batch[i], single, atol=1e-5)


class TestSurface:
    def _saddle_grid(self, nu=5, nv=6):
        u = np.linspace(-1, 1, nu)
        v = np.linspace(-1, 1, nv)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        return jnp.asarray(
            np.stack([uu, vv, uu * vv], axis=-1), jnp.float32)

    def test_surface_interpolates_grid(self):
        grid = self._saddle_grid()
        surf = bspline.interpolate_surface(grid, 3, 3)
        out = np.asarray(bspline.eval_surface(surf, 5, 6))
        # Chord-length params are uniform for this grid -> samples at the
        # original parameters reproduce the grid.
        np.testing.assert_allclose(out, np.asarray(grid), atol=1e-4)

    def test_surface_corners(self):
        grid = self._saddle_grid(4, 4)
        surf = bspline.interpolate_surface(grid, 2, 2)
        out = np.asarray(bspline.eval_surface(surf, 11, 13))
        np.testing.assert_allclose(out[0, 0], np.asarray(grid[0, 0]), atol=1e-4)
        np.testing.assert_allclose(out[-1, -1], np.asarray(grid[-1, -1]), atol=1e-4)

    def test_dense_sampling_smooth(self):
        grid = self._saddle_grid()
        surf = bspline.interpolate_surface(grid, 3, 3)
        out = np.asarray(bspline.eval_surface(surf, 30, 30))
        # z ~= x*y everywhere on a saddle.
        err = np.abs(out[..., 2] - out[..., 0] * out[..., 1]).max()
        assert err < 0.05

    def test_grid_faces(self):
        f = bspline.grid_faces(3, 4)
        assert f.shape == (2 * 2 * 3, 3)
        assert f.max() == 11 and f.min() == 0

    def test_loft_through_curves(self):
        """Loft reproduces a cylinder-ish band through 4 rings."""
        theta = np.linspace(0, 2 * np.pi, 24, endpoint=False)
        rings = []
        for z in (0.0, 1.0, 2.0, 3.0):
            rings.append(np.stack(
                [np.cos(theta), np.sin(theta), np.full_like(theta, z)],
                axis=-1))
        rings = jnp.asarray(np.stack(rings), jnp.float32)  # (4, 24, 3)
        surf = bspline.loft_surface(rings, degree_u=2, degree_v=3)
        out = np.asarray(bspline.eval_surface(surf, 10, 48))
        r = np.linalg.norm(out[..., :2], axis=-1)
        assert abs(r.mean() - 1.0) < 0.05
        assert out[..., 2].min() > -0.01 and out[..., 2].max() < 3.01


class TestScipyOracle:
    """Second, independent oracle: scipy.interpolate.BSpline must agree
    with our Cox-de Boor basis and the full interpolate->evaluate path on
    identical knots/parameters (guards against a shared blind spot with
    the hand-written numpy oracle; VERDICT.md round-1 Missing #5 asked
    for an imported second oracle wherever possible)."""

    def test_basis_matrix_matches_scipy_design_matrix(self):
        from scipy.interpolate import BSpline
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(9, 3))
        degree = 3
        t = np.asarray(bspline.chord_length_params(pts), np.float64)
        knots = np.asarray(bspline.averaged_knots(t, degree, 9), np.float64)
        u = np.linspace(0.0, 0.999999, 40)  # scipy's basis is right-open at 1
        ours = np.asarray(bspline.basis_matrix(u, knots, degree, 9))
        theirs = BSpline.design_matrix(u, knots, degree).toarray()
        np.testing.assert_allclose(ours, theirs, atol=1e-9)

    def test_curve_evaluation_matches_scipy_bspline(self):
        from scipy.interpolate import BSpline
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(7, 2))
        curve = bspline.interpolate_curve(jnp.asarray(pts), degree=3)
        num = 25
        ours = np.asarray(bspline.eval_curve(curve, num))
        spl = BSpline(np.asarray(curve.knots, np.float64),
                      np.asarray(curve.control, np.float64),
                      curve.degree)
        u = np.linspace(0.0, 1.0, num)
        theirs = spl(np.clip(u, 0.0, 1.0 - 1e-12))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)
        # And the interpolation property holds under scipy's evaluation
        # at the chord-length parameters (true second-oracle round trip).
        t = np.asarray(bspline.chord_length_params(pts), np.float64)
        np.testing.assert_allclose(
            spl(np.clip(t, 0.0, 1.0 - 1e-12)), pts, atol=1e-6)
