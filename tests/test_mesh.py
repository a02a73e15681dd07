import numpy as np
import pytest

from tpubody.mesh import grid_mesh, meshio, slicing, smoothing, stitch


def _disk_depth(H=48, W=48, r=16, base=10.0):
    yy, xx = np.mgrid[0:H, 0:W]
    d2 = (xx - W // 2) ** 2 + (yy - H // 2) ** 2
    mask = d2 < r * r
    depth = np.where(mask, base + np.sqrt(np.maximum(r * r - d2, 0)) * 0.3,
                     0.0)
    return depth, mask


class TestGridMesh:
    def test_depth_to_mesh_valid(self):
        depth, mask = _disk_depth()
        color = np.tile(np.array([100.0, 120, 140]), (48, 48, 1))
        weights = np.zeros((48, 48, 4))
        m = grid_mesh.depth_to_mesh(depth, color, weights, mask)
        assert m.faces.min() >= 0
        assert m.faces.max() < m.points.shape[0]
        assert m.points.shape[1] == 3 + 3 + 4
        # Vertex positions are pixel coords + depth.
        assert m.points[:, 2].min() >= 10.0

    def test_back_mesh_winding_flipped(self):
        depth, mask = _disk_depth()
        color = np.zeros((48, 48, 3))
        weights = np.zeros((48, 48, 1))
        f = grid_mesh.depth_to_mesh(depth, color, weights, mask)
        b = grid_mesh.depth_to_mesh(depth, color, weights, mask, is_back=True)
        # Same vertex count; z-component of summed face normals flips sign.
        def z_orient(m):
            v = m.points[:, :3]
            t = m.faces
            n = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
            return n[:, 2].sum()
        assert z_orient(f) * z_orient(b) < 0

    def test_boundary_ring_ordered_cycle(self):
        depth, mask = _disk_depth()
        m = grid_mesh.depth_to_mesh(depth, np.zeros((48, 48, 3)),
                                    np.zeros((48, 48, 1)), mask)
        ring = grid_mesh.boundary_ring(m.faces)
        assert ring.shape[0] > 30
        assert len(set(ring.tolist())) == ring.shape[0]
        # Consecutive ring vertices share a boundary edge -> close in space.
        v = m.points[:, :3]
        d = np.linalg.norm(np.diff(v[np.concatenate([ring, ring[:1]])],
                                   axis=0), axis=1)
        assert d.max() < 2.5

    def test_inner_ring_adjacent(self):
        depth, mask = _disk_depth()
        m = grid_mesh.depth_to_mesh(depth, np.zeros((48, 48, 3)),
                                    np.zeros((48, 48, 1)), mask)
        ring = grid_mesh.boundary_ring(m.faces)
        inner = grid_mesh.inner_ring(m.faces, ring, m.points.shape[0])
        assert inner.shape == ring.shape
        v = m.points[:, :3]
        d = np.linalg.norm(v[inner][:, :2] - v[ring][:, :2], axis=1)
        assert d.max() < 2.5

    def test_rotation_angle_zero_for_equal_depths(self):
        depth, mask = _disk_depth()
        J = np.tile(np.array([[24, 24]]), (24, 1))
        J[16] = [20, 24]
        J[17] = [28, 24]
        a = grid_mesh.back_rotation_angle(depth, depth, J)
        assert abs(a) < 1e-6


class TestSlicing:
    def _tet(self):
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                       np.float64)
        faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
        return pts, faces

    def test_section_centroid_cube_slab(self):
        # Unit cube made of 12 triangles; slice at z = 0.5.
        from itertools import product
        corners = np.array(list(product([0, 1], repeat=3)), np.float64)
        hull_faces = []
        # brute force: all triangles on the cube's surface via convex hull
        from scipy.spatial import ConvexHull
        hull = ConvexHull(corners)
        faces = hull.simplices
        c = slicing.section_centroid(corners, faces, [0.5, 0.5, 0.5],
                                     [0, 0, 1])
        np.testing.assert_allclose(c, [0.5, 0.5, 0.5], atol=1e-8)

    def test_halfspace_restrict(self):
        pts, faces = self._tet()
        vm = slicing.halfspace_vertex_mask(pts, [0, 0, 0.5], [0, 0, 1])
        assert vm.tolist() == [False, False, False, True]
        kept = slicing.restrict_faces(faces, vm)
        assert kept.shape[0] == 0

    def test_cut_faces_plane_triangle(self):
        # One triangle cut in half; attributes interpolate.
        points = np.array([
            [0, 0, 0, 1.0],
            [2, 0, 0, 3.0],
            [0, 2, 0, 5.0],
        ])
        faces = np.array([[0, 1, 2]])
        res = slicing.cut_faces_plane(points, faces, [1, 0, 0], [1, 0, 0])
        # Positive side: x >= 1 — a smaller triangle near vertex 1.
        assert res.points.shape[0] >= 3
        assert (res.points[:, 0] >= 1 - 1e-9).all()
        # Attribute at the cut midpoint of edge (0,1): x=1 -> attr=2.0.
        cut_attrs = res.points[res.boundary, 3]
        assert np.isclose(cut_attrs.min(), 2.0, atol=1e-9)

    def test_cut_keeps_all_when_plane_outside(self):
        pts, faces = self._tet()
        points = np.concatenate([pts, np.zeros((4, 1))], axis=1)
        res = slicing.cut_faces_plane(points, faces, [0, 0, -5], [0, 0, 1])
        assert res.faces.shape[0] == faces.shape[0]
        assert res.boundary.shape[0] == 0


class TestSmoothing:
    def test_humphrey_preserves_flat_grid(self):
        xx, yy = np.meshgrid(np.arange(6.0), np.arange(6.0))
        verts = np.stack([xx.ravel(), yy.ravel(), np.zeros(36)], axis=1)
        from tpubody.mesh.bspline import grid_faces
        faces = grid_faces(6, 6)
        out = smoothing.humphrey(verts, faces, iterations=5)
        assert np.abs(out[:, 2]).max() < 1e-9

    def test_humphrey_reduces_noise(self):
        rng = np.random.default_rng(0)
        xx, yy = np.meshgrid(np.arange(10.0), np.arange(10.0))
        z = rng.normal(scale=0.5, size=100)
        verts = np.stack([xx.ravel(), yy.ravel(), z], axis=1)
        from tpubody.mesh.bspline import grid_faces
        faces = grid_faces(10, 10)
        out = smoothing.humphrey(verts, faces, iterations=10)
        assert out[:, 2].std() < z.std()

    def test_band_grid_smoother(self):
        rng = np.random.default_rng(1)
        band = rng.normal(size=(5, 20, 3))
        out = smoothing.smooth_band_grid(band)
        assert out.shape == band.shape
        assert np.isfinite(out).all()


class TestStitch:
    def test_stitch_disk_watertight_band(self):
        H = W = 48
        front, mask = _disk_depth(H, W, 14, base=10.0)
        back = np.where(mask, 22.0 - (front - 10.0), 0.0)
        color = np.tile(np.array([128.0, 128, 128]), (H, W, 1))
        weights = np.zeros((H, W, 24))
        weights[..., 0] = 1.0
        J = np.tile(np.array([[W // 2, H // 2]]), (24, 1))
        # plausible joint layout for rotation/slicing
        J[16] = [W // 2 - 6, H // 2 - 4]; J[17] = [W // 2 + 6, H // 2 - 4]
        J[18] = [W // 2 - 10, H // 2]; J[19] = [W // 2 + 10, H // 2]
        J[20] = [W // 2 - 12, H // 2 + 3]; J[21] = [W // 2 + 12, H // 2 + 3]
        J[22] = [W // 2 - 13, H // 2 + 4]; J[23] = [W // 2 + 13, H // 2 + 4]
        J[0] = [W // 2, H // 2 + 8]; J[3] = [W // 2, H // 2 - 8]
        J[1] = [W // 2 - 4, H // 2 + 8]; J[2] = [W // 2 + 4, H // 2 + 8]

        res = stitch.stitch_mesh(front, color, back, color, weights, J)
        assert np.isfinite(res.points).all()
        assert res.faces.max() < res.points.shape[0]
        assert res.joints3d.shape == (24, 3)
        # The stitched mesh has no boundary edges along the silhouette band
        # between the front sheet and band (count much lower than one sheet).
        from tpubody.mesh.grid_mesh import boundary_edges
        open_edges = boundary_edges(res.faces)
        n_front_only = boundary_edges(
            grid_mesh.depth_to_mesh(front, color, weights,
                                    front > 0).faces).shape[0]
        assert open_edges.shape[0] < n_front_only

    def test_stitch_attrs_blend(self):
        H = W = 40
        front, mask = _disk_depth(H, W, 12, base=5.0)
        back = np.where(mask, 14.0 - (front - 5.0), 0.0)
        cf = np.tile(np.array([255.0, 0, 0]), (H, W, 1))
        cb = np.tile(np.array([0.0, 0, 255]), (H, W, 1))
        weights = np.zeros((H, W, 24)); weights[..., 0] = 1.0
        J = np.tile(np.array([[W // 2, H // 2]]), (24, 1))
        J[16] = [W // 2 - 5, H // 2 - 3]; J[17] = [W // 2 + 5, H // 2 - 3]
        J[18] = [W // 2 - 8, H // 2]; J[19] = [W // 2 + 8, H // 2]
        J[20] = [W // 2 - 10, H // 2 + 2]; J[21] = [W // 2 + 10, H // 2 + 2]
        J[0] = [W // 2, H // 2 + 6]; J[3] = [W // 2, H // 2 - 6]
        J[1] = [W // 2 - 3, H // 2 + 6]; J[2] = [W // 2 + 3, H // 2 + 6]
        res = stitch.stitch_mesh(front, cf, back, cb, weights, J)
        # Band vertices carry blended colors strictly between red and blue.
        n_grid = (res.points[:, 3] == 255).sum() + (res.points[:, 5] == 255).sum()
        blended = res.points[(res.points[:, 3] > 0) & (res.points[:, 5] > 0)]
        assert blended.shape[0] > 0


class TestMeshIO:
    def test_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        verts = rng.normal(size=(10, 3)).astype(np.float32)
        faces = rng.integers(0, 10, size=(6, 3)).astype(np.int32)
        colors = rng.integers(0, 255, size=(10, 3)).astype(np.uint8)
        for binary in (True, False):
            p = str(tmp_path / f"m_{binary}.ply")
            meshio.write_ply(p, verts, faces, colors, binary=binary)
            v, f, c = meshio.read_ply(p)
            np.testing.assert_allclose(v, verts, atol=1e-6)
            np.testing.assert_array_equal(f, faces)
            np.testing.assert_array_equal(c, colors)

    def test_obj_roundtrip(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
        faces = np.array([[0, 1, 2]])
        p = str(tmp_path / "m.obj")
        meshio.write_obj(p, verts, faces)
        v, f = meshio.read_obj(p)
        np.testing.assert_allclose(v, verts, atol=1e-6)
        np.testing.assert_array_equal(f, faces)

    def test_off_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        verts = rng.normal(size=(12, 3))
        faces = rng.integers(0, 12, size=(7, 3))
        p = str(tmp_path / "m.off")
        meshio.write_off(p, verts, faces)
        v, f = meshio.read_off(p)
        np.testing.assert_allclose(v, verts, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(f, faces)

    def test_off_reads_reference_style_header(self, tmp_path):
        # The reference writer (obj_functions.py:298-307) emits a comment
        # and a blank line between "OFF" and the counts.
        p = tmp_path / "ref.off"
        p.write_text("OFF\n# convert by tsukasa\n\n"
                     "3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
        v, f = meshio.read_off(str(p))
        assert v.shape == (3, 3) and f.shape == (1, 3)
        np.testing.assert_array_equal(f[0], [0, 1, 2])


class TestStitchFuzz:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_randomized_silhouettes(self, seed):
        """Stitching stays finite/valid over randomized blobby masks."""
        rng = np.random.default_rng(seed)
        H = W = 40
        yy, xx = np.mgrid[0:H, 0:W]
        cx, cy = rng.uniform(16, 24, 2)
        rx, ry = rng.uniform(8, 13, 2)
        wob = 1 + 0.15 * np.sin(np.arctan2(yy - cy, xx - cx)
                                * rng.integers(2, 5))
        mask = ((((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) < wob)
        front = np.where(mask, 5.0 + rng.random((H, W)), 0.0)
        back = np.where(mask, 9.0 + rng.random((H, W)), 0.0)
        color = rng.uniform(0, 255, (H, W, 3))
        weights = rng.random((H, W, 24))
        weights /= weights.sum(-1, keepdims=True)
        J = np.tile(np.array([[W // 2, H // 2]]), (24, 1))
        J[16] = [W // 2 - 4, H // 2 - 3]; J[17] = [W // 2 + 4, H // 2 - 3]
        J[18] = [W // 2 - 7, H // 2]; J[19] = [W // 2 + 7, H // 2]
        J[20] = [W // 2 - 9, H // 2 + 2]; J[21] = [W // 2 + 9, H // 2 + 2]
        J[0] = [W // 2, H // 2 + 5]; J[3] = [W // 2, H // 2 - 5]
        J[1] = [W // 2 - 3, H // 2 + 5]; J[2] = [W // 2 + 3, H // 2 + 5]
        J = np.clip(J, 1, [W - 2, H - 2])
        res = stitch.stitch_mesh(front, color, back, color, weights, J)
        assert np.isfinite(res.points).all()
        assert res.faces.min() >= 0
        assert res.faces.max() < res.points.shape[0]
        assert np.isfinite(res.joints3d).all()


    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_thin_appendages_and_specks(self, seed):
        """The demo-chain regression: 1-2 px-wide appendages pinch the
        boundary rings so inner == outer, which made the B-spline loft
        collocation singular (an all-NaN band). Thin arms + disconnected
        specks must still stitch finite."""
        rng = np.random.default_rng(seed + 100)
        H = W = 40
        yy, xx = np.mgrid[0:H, 0:W]
        mask = (((xx - 20) ** 2 / 49.0 + (yy - 20) ** 2 / 100.0) < 1)
        # 1-2 px wide "arms" sticking out both sides
        row = 14 + int(rng.integers(0, 4))
        mask[row:row + 1 + int(rng.integers(0, 2)), 2:14] = True
        mask[row:row + 2, 26:38] = True
        # disconnected specks (depth fragments)
        for _ in range(3):
            sy, sx = rng.integers(2, H - 2), rng.integers(2, W - 2)
            mask[sy, sx] = True
        front = np.where(mask, 5.0 + rng.random((H, W)), 0.0)
        back = np.where(mask, 9.0 + rng.random((H, W)), 0.0)
        color = rng.uniform(0, 255, (H, W, 3))
        weights = rng.random((H, W, 24))
        weights /= weights.sum(-1, keepdims=True)
        J = np.tile(np.array([[W // 2, H // 2]]), (24, 1))
        J[16] = [W // 2 - 4, row]; J[17] = [W // 2 + 4, row]
        J[18] = [W // 2 - 10, row]; J[19] = [W // 2 + 10, row]
        J[20] = [4, row]; J[21] = [W - 4, row]
        J[0] = [W // 2, H // 2 + 5]; J[3] = [W // 2, H // 2 - 5]
        J[1] = [W // 2 - 3, H // 2 + 5]; J[2] = [W // 2 + 3, H // 2 + 5]
        J = np.clip(J, 1, [W - 2, H - 2])
        res = stitch.stitch_mesh(front, color, back, color, weights, J)
        assert np.isfinite(res.points).all()
        assert res.faces.max() < res.points.shape[0]
        assert np.isfinite(res.joints3d).all()


class TestSlicingFuzz:
    """Property fuzz of the attribute-carrying plane cut: for random
    convex-ish tubes and random planes, the kept half must (a) lie in the
    positive halfspace, (b) have its cut boundary on the plane, and (c)
    only produce attributes inside the per-column input range (linear
    interpolation along edges cannot extrapolate)."""

    def _tube(self, rng, n_ax=6, n_circ=8):
        xs = np.linspace(-1.0, 1.0, n_ax)
        th = np.linspace(0, 2 * np.pi, n_circ, endpoint=False)
        verts = np.array([[x, 0.4 * np.cos(t), 0.4 * np.sin(t)]
                          for x in xs for t in th])
        faces = []
        for i in range(n_ax - 1):
            for j in range(n_circ):
                a = i * n_circ + j
                b = i * n_circ + (j + 1) % n_circ
                c = (i + 1) * n_circ + j
                d = (i + 1) * n_circ + (j + 1) % n_circ
                faces += [[a, b, c], [b, d, c]]
        attrs = np.concatenate(
            [verts, rng.uniform(0, 1, (verts.shape[0], 5))], axis=1)
        return attrs, np.asarray(faces, np.int64)

    def test_random_planes_keep_halfspace_invariants(self):
        rng = np.random.default_rng(0)
        for trial in range(25):
            attrs, faces = self._tube(rng)
            normal = rng.normal(size=3)
            normal /= np.linalg.norm(normal)
            origin = rng.uniform(-0.5, 0.5, 3)
            cut = slicing.cut_faces_plane(attrs, faces, origin, normal)
            if cut.faces.shape[0] == 0:
                continue
            used = np.unique(cut.faces)
            pts = cut.points[used]
            d = slicing.signed_distance(pts[:, :3], origin, normal)
            assert d.min() > -1e-9, (trial, d.min())
            # cut-edge vertices sit ON the plane
            if len(cut.boundary) > 0:
                db = slicing.signed_distance(
                    cut.points[np.asarray(cut.boundary)][:, :3],
                    origin, normal)
                assert np.abs(db).max() < 1e-9, trial
            # interpolation never extrapolates any attribute column
            lo = attrs.min(axis=0) - 1e-9
            hi = attrs.max(axis=0) + 1e-9
            assert (cut.points >= lo).all() and (cut.points <= hi).all()

    def test_complement_cuts_partition_area(self):
        """Cutting with n and -n partitions total surface area (the split
        triangles on each side tile the originals)."""
        rng = np.random.default_rng(1)

        def area(points, faces):
            if faces.shape[0] == 0:
                return 0.0
            t = points[:, :3][faces]
            return float(np.linalg.norm(
                np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]),
                axis=1).sum() / 2)

        for trial in range(10):
            attrs, faces = self._tube(rng)
            normal = rng.normal(size=3)
            normal /= np.linalg.norm(normal)
            origin = rng.uniform(-0.4, 0.4, 3)
            pos = slicing.cut_faces_plane(attrs, faces, origin, normal)
            neg = slicing.cut_faces_plane(attrs, faces, origin, -normal)
            total = area(attrs, faces)
            got = area(pos.points, pos.faces) + area(neg.points, neg.faces)
            np.testing.assert_allclose(got, total, rtol=1e-6)
