import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.image import boundary_match, contours, mvc, warp


def _disk_mask(H=64, W=64, cx=32, cy=32, r=20):
    yy, xx = np.mgrid[0:H, 0:W]
    return ((xx - cx) ** 2 + (yy - cy) ** 2 < r * r).astype(np.uint8) * 255


class TestContours:
    def test_trace_is_closed_ring(self):
        mask = _disk_mask()
        c = contours.trace_boundary(mask)
        assert c.shape[0] > 40
        # Every traced point is foreground and touches background.
        for x, y in c[::7]:
            assert mask[y, x] > 0
        # Consecutive points are 8-adjacent.
        d = np.abs(np.diff(np.vstack([c, c[:1]]), axis=0)).max(axis=1)
        assert (d <= 1).all()

    def test_trace_square_count(self):
        mask = np.zeros((10, 10), np.uint8)
        mask[2:7, 2:7] = 1
        c = contours.trace_boundary(mask)
        # 5x5 square boundary = 16 pixels.
        assert c.shape[0] == 16

    def test_subsample(self):
        mask = _disk_mask()
        c = contours.trace_boundary(mask)
        s = contours.subsample(c, 0.5)
        assert abs(s.shape[0] - c.shape[0] // 2) <= 1

    def test_inner_points(self):
        mask = np.zeros((8, 8), np.uint8)
        mask[3, 4] = 1
        pts = contours.inner_points(mask)
        assert pts.shape == (1, 2)
        assert pts[0, 0] == 4 and pts[0, 1] == 3  # (x, y)


class TestBoundaryMatch:
    def test_identical_contours_match_identity(self):
        mask = _disk_mask()
        c = contours.trace_boundary(mask).astype(np.float64)
        match = boundary_match.match_boundaries(c, c, k=8)
        d = np.linalg.norm(c[match] - c, axis=1)
        assert np.median(d) < 2.0

    def test_scaled_contour_monotone(self):
        big = contours.trace_boundary(_disk_mask(r=24))
        small = contours.trace_boundary(_disk_mask(r=12))
        match = boundary_match.match_boundaries(big, small, k=16)
        assert match.shape[0] == small.shape[0]
        # Monotone non-decreasing assignment.
        assert (np.diff(match) >= 0).all()
        # Matched points should be geometrically close to the small contour
        # scaled outward: just check distances are bounded by the radius gap.
        d = np.linalg.norm(big[match] - small, axis=1)
        assert np.median(d) < 16.0


class TestMVC:
    def test_weights_sum_to_one(self):
        poly = jnp.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], jnp.float32)
        pts = jnp.asarray([[3, 3], [5, 5], [9, 1]], jnp.float32)
        w = np.asarray(mvc.mean_value_coordinates(pts, poly))
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)

    def test_center_of_square_uniform(self):
        poly = jnp.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], jnp.float32)
        pts = jnp.asarray([[5, 5]], jnp.float32)
        w = np.asarray(mvc.mean_value_coordinates(pts, poly))
        np.testing.assert_allclose(w[0], 0.25, atol=1e-5)

    def test_on_vertex_delta(self):
        poly = jnp.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], jnp.float32)
        pts = jnp.asarray([[10, 0]], jnp.float32)
        w = np.asarray(mvc.mean_value_coordinates(pts, poly))
        np.testing.assert_allclose(w[0], [0, 1, 0, 0], atol=1e-5)

    def test_on_edge_linear(self):
        poly = jnp.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], jnp.float32)
        pts = jnp.asarray([[2.5, 0]], jnp.float32)
        w = np.asarray(mvc.mean_value_coordinates(pts, poly))
        np.testing.assert_allclose(w[0], [0.75, 0.25, 0, 0], atol=1e-4)

    def test_linear_reproduction(self):
        """MVC reproduces linear functions: warp identity polygon = identity."""
        rng = np.random.default_rng(0)
        poly = np.array([[0, 0], [20, 0], [20, 20], [0, 20],
                         [0, 10]], np.float32)
        pts = rng.uniform(2, 18, size=(40, 2)).astype(np.float32)
        out = np.asarray(mvc.warp_points(
            jnp.asarray(pts), jnp.asarray(poly), jnp.asarray(poly)))
        np.testing.assert_allclose(out, pts, atol=1e-2)

    def test_translation_transport(self):
        poly = np.array([[0, 0], [20, 0], [20, 20], [0, 20]], np.float32)
        shifted = poly + np.array([5, 7], np.float32)
        pts = np.array([[4, 4], [10, 15]], np.float32)
        out = np.asarray(mvc.warp_points(
            jnp.asarray(pts), jnp.asarray(poly), jnp.asarray(shifted)))
        np.testing.assert_allclose(out, pts + np.array([5, 7]), atol=1e-2)


class TestWarpStage:
    def _make_value_map(self, mask, C=30):
        """Value map with smooth gradients inside mask, 1.0 background in
        normal channels (matching the renderer's clear color)."""
        H, W = mask.shape
        yy, xx = np.mgrid[0:H, 0:W] / max(H, W)
        value = np.ones((H, W, C), np.float32)
        value[..., 6:] = 0.0
        inside = mask > 0
        for c in range(6):
            value[..., c] = np.where(inside, 0.1 + 0.05 * c + 0.3 * xx, 1.0)
        for c in range(6, C):
            value[..., c] = np.where(inside, 0.5 + 0.01 * c * yy, 0.0)
        return value

    def test_silhouette_from_value(self):
        mask = _disk_mask()
        value = self._make_value_map(mask)
        sil = np.asarray(warp.silhouette_from_value(jnp.asarray(value)))
        np.testing.assert_array_equal(sil, mask > 0)

    def test_scatter_roundtrip_identity(self):
        mask = _disk_mask(H=32, W=32, cx=16, cy=16, r=10)
        value = self._make_value_map(mask, C=8)
        inner = contours.inner_points(mask)
        out = np.asarray(warp.scatter_warp(
            jnp.asarray(value), jnp.asarray(inner),
            jnp.asarray(inner, jnp.float32)))
        np.testing.assert_allclose(
            out[mask > 0], value[mask > 0], atol=1e-6)

    def test_fill_holes_saturates_mask(self):
        mask = _disk_mask(H=32, W=32, cx=16, cy=16, r=10) > 0
        value = np.zeros((32, 32, 4), np.float32)
        # Only a few seed pixels filled.
        value[16, 16] = [1, 2, 3, 4]
        value[12, 18] = [2, 3, 4, 5]
        out = np.asarray(warp.fill_holes(jnp.asarray(value), jnp.asarray(mask)))
        filled = np.abs(out).sum(-1) > 0
        assert filled[mask].all()
        assert np.isfinite(out).all()

    def test_fill_holes_pyramid_saturates_mask(self):
        """The production default fill (warp_stage fill="pyramid") must
        saturate the mask from sparse seeds, like the diffusion fill."""
        mask = _disk_mask(H=32, W=32, cx=16, cy=16, r=10) > 0
        value = np.zeros((32, 32, 4), np.float32)
        value[16, 16] = [1, 2, 3, 4]
        value[12, 18] = [2, 3, 4, 5]
        out = np.asarray(warp.fill_holes_pyramid(
            jnp.asarray(value), jnp.asarray(mask)))
        filled = np.abs(out).sum(-1) > 0
        assert filled[mask].all()
        assert np.isfinite(out).all()
        # Every filled value is a convex combination of the seeds: it
        # stays inside the seeds' per-channel range.
        for c in range(4):
            assert out[..., c][mask].min() >= value[..., c][mask].min() - 1e-5
            assert out[..., c][mask].max() <= value[..., c][mask].max() + 1e-5

    def test_fill_holes_pyramid_passthrough(self):
        """Already-filled pixels and out-of-mask pixels are untouched."""
        rng = np.random.default_rng(3)
        mask = _disk_mask(H=32, W=32, cx=16, cy=16, r=12) > 0
        value = rng.uniform(0.2, 0.9, size=(32, 32, 3)).astype(np.float32)
        holes = np.zeros_like(mask)
        holes[14:18, 10:20] = True          # punch a hole inside the mask
        value[holes & mask] = 0.0
        out = np.asarray(warp.fill_holes_pyramid(
            jnp.asarray(value), jnp.asarray(mask)))
        keep = mask & ~holes
        np.testing.assert_array_equal(out[keep], value[keep])
        np.testing.assert_array_equal(out[~mask], value[~mask])
        # Hole pixels got filled with local (in-range) values.
        hole_vals = out[holes & mask]
        assert (np.abs(hole_vals).sum(-1) > 0).all()
        assert hole_vals.min() >= 0.2 - 1e-5
        assert hole_vals.max() <= 0.9 + 1e-5

    def test_fill_holes_pyramid_constant_field_exact(self):
        """On a constant seed field the fill is exact: every hole takes
        the constant (any weighted mean of equal values is that value)."""
        mask = _disk_mask(H=64, W=64, cx=32, cy=32, r=24) > 0
        value = np.zeros((64, 64, 2), np.float32)
        seeds = mask & (np.random.default_rng(0).random((64, 64)) < 0.1)
        value[seeds] = [0.5, 0.25]
        out = np.asarray(warp.fill_holes_pyramid(
            jnp.asarray(value), jnp.asarray(mask)))
        np.testing.assert_allclose(out[mask, 0], 0.5, atol=1e-6)
        np.testing.assert_allclose(out[mask, 1], 0.25, atol=1e-6)

    def test_fill_holes_pyramid_close_to_diffusion_on_smooth_field(self):
        """Quality gate for the default switch (diffusion -> pyramid): on a
        smooth field with scattered holes the two fills agree closely on
        the hole pixels (the reference semantics both replace:
        lib/Warp.py:354-456)."""
        H = W = 64
        mask = _disk_mask(H, W, 32, 32, 24) > 0
        yy, xx = np.mgrid[0:H, 0:W] / 64.0
        field = np.stack([0.3 + 0.4 * xx, 0.6 - 0.3 * yy], -1).astype(
            np.float32)
        rng = np.random.default_rng(7)
        value = np.where((mask & (rng.random((H, W)) < 0.6))[..., None],
                         field, 0.0).astype(np.float32)
        mj, vj = jnp.asarray(mask), jnp.asarray(value)
        pyr = np.asarray(warp.fill_holes_pyramid(vj, mj))
        dif = np.asarray(warp.fill_holes(vj, mj))
        holes = mask & (np.abs(value).sum(-1) == 0)
        delta = np.abs(pyr[holes] - dif[holes])
        # Field dynamic range is ~0.4; the fills agree to a small fraction
        # of it on the vast majority of hole pixels.
        assert np.median(delta) < 0.02
        assert delta.mean() < 0.04

    def test_full_stage_disk_to_ellipse(self):
        """Warp a disk-domain value map into an ellipse silhouette."""
        H = W = 64
        src_mask = _disk_mask(H, W, 32, 32, 18)
        yy, xx = np.mgrid[0:H, 0:W]
        dst_mask = ((((xx - 32) / 24.0) ** 2 + ((yy - 32) / 14.0) ** 2) < 1
                    ).astype(np.uint8) * 255
        value = self._make_value_map(src_mask)
        res = warp.warp_stage(dst_mask, value)
        out = np.asarray(res.value)
        m = dst_mask > 0
        # Output covers the destination mask with finite, in-range values.
        assert (np.abs(out[m]).sum(-1) > 0).mean() > 0.99
        assert (out[~m] == 0).all()
        # Warped normal channels stay within the source value range.
        assert out[..., 0][m].min() >= 0.0
        assert out[..., 0][m].max() <= 1.0 + 1e-5


def test_chunked_warp_matches_dense():
    rng = np.random.default_rng(9)
    poly = np.array([[0, 0], [50, 0], [50, 50], [0, 50]], np.float32)
    dst = poly * 1.3 + 2.0
    pts = rng.uniform(5, 45, size=(1000, 2)).astype(np.float32)
    dense = np.asarray(mvc.warp_points(
        jnp.asarray(pts), jnp.asarray(poly), jnp.asarray(dst)))
    chunked = np.asarray(mvc.warp_points_chunked(
        jnp.asarray(pts), jnp.asarray(poly), jnp.asarray(dst), chunk=128))
    np.testing.assert_allclose(chunked, dense, atol=1e-4)
