"""Native C++ geometry library vs the Python reference implementations."""
import numpy as np
import pytest

from tpubody import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library failed to build")


def _disk(H=64, W=64, r=20):
    yy, xx = np.mgrid[0:H, 0:W]
    return (((xx - W // 2) ** 2 + (yy - H // 2) ** 2) < r * r
            ).astype(np.uint8)


@requires_native
class TestNativeTrace:
    def test_matches_python_tracer(self):
        # Compare against the documented Python fallback directly.
        from tpubody.image import contours
        mask = _disk()
        fast = native.trace_boundary(mask)

        # Force the Python path by monkeypatch-free re-implementation call:
        import importlib
        native_mod = native

        class _Off:
            @staticmethod
            def trace_boundary(m):
                return None
        import tpubody
        orig = tpubody.native
        tpubody.native = _Off  # type: ignore
        try:
            slow = contours.trace_boundary(mask)
        finally:
            tpubody.native = orig

        np.testing.assert_array_equal(fast, slow)

    def test_empty_mask(self):
        out = native.trace_boundary(np.zeros((8, 8), np.uint8))
        assert out.shape[0] == 0

    def test_grows_buffer_for_snake(self):
        # A long 1-px snake has perimeter >> 8*(H+W).
        mask = np.zeros((64, 64), np.uint8)
        for i in range(0, 64, 2):
            mask[i, :] = 1
            if (i // 2) % 2 == 0:
                mask[i + 1, -1] = 1
            elif i + 1 < 64:
                mask[i + 1, 0] = 1
        out = native.trace_boundary(mask)
        assert out.shape[0] > 8 * 128


@requires_native
class TestNativeRing:
    def test_matches_python_walk(self):
        from tpubody.mesh import grid_mesh
        from tests.test_mesh import _disk_depth
        depth, mask = _disk_depth()
        m = grid_mesh.depth_to_mesh(depth, np.zeros((48, 48, 3)),
                                    np.zeros((48, 48, 1)), mask)
        be = grid_mesh.boundary_edges(m.faces)
        fast = native.boundary_ring_walk(be)
        assert fast is not None
        # Same cycle membership and adjacency as the Python walk result.
        ring = grid_mesh.boundary_ring(m.faces)  # (native used inside too)
        assert set(fast.tolist()) == set(ring.tolist())


@requires_native
class TestNativeBoundaryEdges:
    def test_matches_numpy_unique_path(self):
        """Same once-only edge SET as the numpy unique path (order differs:
        code-sorted vs face order; every caller treats edges as a set)."""
        from tpubody.mesh import grid_mesh
        from tests.test_mesh import _disk_depth
        depth, mask = _disk_depth()
        m = grid_mesh.depth_to_mesh(depth, np.zeros((48, 48, 3)),
                                    np.zeros((48, 48, 1)), mask)
        fast = native.boundary_edges_from_faces(m.faces)
        assert fast is not None

        f = np.asarray(m.faces, np.int64)
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
        V = f.max() + 1
        codes = np.minimum(e[:, 0], e[:, 1]) * V + np.maximum(e[:, 0], e[:, 1])
        _, inv, counts = np.unique(codes, return_inverse=True,
                                   return_counts=True)
        slow = e[counts[inv] == 1]
        canon = lambda arr: {(min(a, b), max(a, b)) for a, b in arr.tolist()}
        assert canon(fast) == canon(slow)
        assert fast.shape == slow.shape

    def test_triangle_soup_all_boundary(self):
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
        out = native.boundary_edges_from_faces(faces)
        assert out.shape == (6, 2)

    def test_empty(self):
        out = native.boundary_edges_from_faces(np.zeros((0, 3), np.int64))
        assert out.shape == (0, 2)


@requires_native
class TestNativeBacktrack:
    def test_matches_python(self):
        rng = np.random.default_rng(0)
        m, n = 20, 30
        args = rng.integers(0, n, size=(m - 1, n))
        j = 17
        fast = native.dp_backtrack(args, j)
        out = [j]
        jj = j
        for i in range(m - 2, -1, -1):
            jj = int(args[i, jj])
            out.append(jj)
        np.testing.assert_array_equal(fast, np.asarray(out[::-1]))


@requires_native
class TestNativeGridMesh:
    def test_matches_numpy_path(self, monkeypatch):
        """Bit-exact face/vertex parity (order included) with the numpy
        fallback, both windings, with a hole and the pixel-0 sentinel."""
        from tpubody.mesh import grid_mesh

        H, W = 37, 45
        rng = np.random.default_rng(3)
        mask = np.zeros((H, W), bool)
        mask[5:30, 8:40] = True
        mask[12:18, 20:26] = False      # interior hole
        mask[0, 0] = True               # pixel 0 = background sentinel
        depth = rng.uniform(1, 5, (H, W)).astype(np.float32)
        color = rng.uniform(size=(H, W, 3)).astype(np.float32)
        weights = rng.uniform(size=(H, W, 4)).astype(np.float32)
        for is_back, rot in ((False, None), (True, 0.3)):
            fast = grid_mesh.depth_to_mesh(depth, color, weights, mask,
                                           is_back=is_back, rotate_y=rot)
            with monkeypatch.context() as mp:
                mp.setattr(native, "grid_mesh_build", lambda *a: None)
                slow = grid_mesh.depth_to_mesh(depth, color, weights, mask,
                                               is_back=is_back, rotate_y=rot)
            np.testing.assert_array_equal(fast.faces, slow.faces)
            np.testing.assert_allclose(fast.points, slow.points, atol=1e-5)
            assert fast.points.dtype == np.float32


@requires_native
def test_native_speedup_trace():
    """Native tracer should beat the Python loop comfortably at 1024^2."""
    import time
    mask = _disk(1024, 1024, 480)
    t0 = time.perf_counter()
    out = native.trace_boundary(mask)
    native_t = time.perf_counter() - t0
    assert out.shape[0] > 2000
    assert native_t < 0.5
