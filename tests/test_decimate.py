import numpy as np
import pytest

from tpubody.mesh import decimate
from tests.test_mesh import _disk_depth
from tpubody.mesh import grid_mesh


def _dense_mesh():
    depth, mask = _disk_depth(H=96, W=96, r=40)
    color = np.tile(np.array([100.0, 150, 200]), (96, 96, 1))
    weights = np.random.default_rng(0).random((96, 96, 24))
    weights /= weights.sum(-1, keepdims=True)
    return grid_mesh.depth_to_mesh(depth, color, weights, mask)


class TestClusterDecimate:
    def test_reduces_counts(self):
        m = _dense_mesh()
        res = decimate.cluster_decimate(m.points, m.faces, cell_size=4.0)
        assert res.points.shape[0] < m.points.shape[0] / 4
        assert res.faces.shape[0] < m.faces.shape[0] / 4
        assert res.faces.max() < res.points.shape[0]

    def test_preserves_shape(self):
        m = _dense_mesh()
        res = decimate.cluster_decimate(m.points, m.faces, cell_size=3.0)
        # Bounding box roughly preserved.
        for c in range(3):
            lo0, hi0 = m.points[:, c].min(), m.points[:, c].max()
            lo1, hi1 = res.points[:, c].min(), res.points[:, c].max()
            assert abs(lo1 - lo0) < 4.0 and abs(hi1 - hi0) < 4.0

    def test_attrs_averaged_in_range(self):
        m = _dense_mesh()
        res = decimate.cluster_decimate(m.points, m.faces, cell_size=4.0)
        assert res.points[:, 3:6].min() >= 99.0
        assert res.points[:, 3:6].max() <= 201.0

    def test_target_verts(self):
        m = _dense_mesh()
        res = decimate.cluster_decimate(m.points, m.faces, target_verts=500)
        assert 100 < res.points.shape[0] < 3000

    def test_no_degenerate_or_duplicate_faces(self):
        m = _dense_mesh()
        res = decimate.cluster_decimate(m.points, m.faces, cell_size=5.0)
        f = res.faces
        assert (f[:, 0] != f[:, 1]).all()
        assert (f[:, 1] != f[:, 2]).all()
        key = np.sort(f, axis=1)
        assert np.unique(key, axis=0).shape[0] == f.shape[0]


class TestDecimateAvatar:
    def test_avatar_roundtrip_and_animates(self):
        from tests.test_animate import _sphere_avatar
        from tpubody.mesh import rigging
        av = _sphere_avatar()
        out = decimate.decimate_avatar(av, target_verts=100)
        assert out.v_template.shape[0] < av.v_template.shape[0]
        np.testing.assert_allclose(out.weights.sum(1), 1.0, atol=1e-9)
        frames = np.asarray(rigging.animate(out, np.zeros((2, 24, 3))))
        assert np.isfinite(frames).all()
