"""Structured humanoid stand-in model (tpubody/models/humanoid.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.models import humanoid as hum
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib


@pytest.fixture(scope="module", params=[24, 52])
def raw(request):
    return request.param, hum.humanoid_numpy(request.param, 3000, seed=0)


class TestGeometry:
    def test_capsules_are_closed_manifolds(self, raw):
        _, r = raw
        f = np.asarray(r["faces"], np.int64)
        e = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]],
                                    f[:, [2, 0]]]), axis=1)
        _, counts = np.unique(e[:, 0] * 10_000_000 + e[:, 1],
                              return_counts=True)
        assert set(counts.tolist()) == {2}    # every edge in exactly 2 faces

    def test_joint_regressor_exact(self, raw):
        nj, r = raw
        J = r["j_regressor"] @ r["v_template"]
        np.testing.assert_allclose(J, hum.tpose_joints(nj), atol=1e-12)

    def test_exact_vertex_count_and_padding(self):
        r = hum.humanoid_numpy(24, 3000)
        assert r["v_template"].shape == (3000, 3)
        # padded verts are unreferenced by faces
        assert r["faces"].max() < 3000
        with pytest.raises(ValueError, match="minimum resolution"):
            hum.humanoid_numpy(24, 100)

    def test_weights_are_local_and_normalized(self, raw):
        nj, r = raw
        w = r["weights"]
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
        # a vertex at the left wrist ring is dominated by arm joints
        ring = np.argmin(np.linalg.norm(
            r["v_template"] - hum.tpose_joints(nj)[20], axis=1))
        top = int(np.argmax(w[ring]))
        assert top in (18, 20, 22), top   # elbow/wrist/hand family


class TestBehaviour:
    def test_lbs_forward_bends_the_arm(self):
        m = hum.humanoid(24, 2000)
        pose = np.zeros((24, 3))
        pose[18] = [0.0, 0.0, np.pi / 2]      # left elbow 90 deg about z
        st = smpl_lib.forward(m, jnp.asarray(pose, jnp.float32),
                              jnp.zeros(10))
        wrist = np.asarray(st.joints_posed)[20]
        # forearm rotated from +x to +y around the elbow at x=0.43
        assert abs(wrist[0] - 0.43) < 0.02
        assert wrist[1] > 0.55
        assert np.isfinite(np.asarray(st.verts)).all()

    def test_wrist_section_ring(self):
        from tpubody.mesh import slicing
        r = hum.humanoid_numpy(24, 3000)
        J = hum.tpose_joints(24)
        ring = slicing.section_ring(r["v_template"], r["faces"], J[20],
                                    np.array([1.0, 0.0, 0.0]), near=J[20])
        assert ring.shape[0] >= 6

    def test_hand_graft_succeeds_strictly(self):
        """The failure mode the blob model could never pass: SMPL hands
        graft onto the body at the wrists with real section rings and cut
        boundaries on both sides."""
        from tpubody.mesh import hands as hands_lib
        body = hum.humanoid_numpy(24, 3000, seed=0)
        donor = hum.humanoid_numpy(24, 3000, seed=1)
        J = hum.tpose_joints(24)
        bp = np.concatenate([body["v_template"],
                             np.full((3000, 3), 100.0),
                             body["weights"]], axis=1)
        sp = np.concatenate([donor["v_template"],
                             np.full((3000, 3), 125.0),
                             donor["weights"]], axis=1)
        res = hands_lib.replace_hands_mesh(
            bp, body["faces"], J, sp, donor["faces"], J.copy())
        assert res.points.shape[0] > 0
        assert np.isfinite(res.points).all()
        assert res.faces.max() < res.points.shape[0]

    def test_load_or_synthetic_prefers_humanoid(self):
        m = params_lib.load_or_synthetic("smpl", n_joints=24, n_verts=3000,
                                         warn=False)
        # humanoid signature: exact joint regression onto the T-pose table
        J = np.asarray(m.j_regressor) @ np.asarray(m.v_template)
        np.testing.assert_allclose(J, hum.tpose_joints(24), atol=1e-5)
        # tiny budgets fall back to the blob rather than erroring
        tiny = params_lib.load_or_synthetic("smpl", n_joints=24, n_verts=64,
                                            warn=False)
        assert tiny.v_template.shape == (64, 3)
