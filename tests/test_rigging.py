import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.core import lbs as lbs_lib
from tpubody.core import skeleton as skeleton_lib
from tpubody.mesh import rigging
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib


@pytest.fixture(scope="module")
def smpl_model():
    return params_lib.synthetic(n_joints=24, n_verts=500, seed=4)


class TestSkeleton:
    def test_zero_motion_keeps_rest(self, smpl_model):
        rest = np.asarray(smpl_lib.forward(
            smpl_model, jnp.zeros((24, 3)), jnp.zeros(10)).joints_rest)
        sk = skeleton_lib.Skeleton(parents=smpl_model.parents,
                                   rest_joints=rest)
        sk.set_motion(np.tile(np.eye(3), (24, 1, 1)))
        sk.update_coords()
        np.testing.assert_allclose(sk.coords, rest, atol=1e-10)

    def test_export_theta_roundtrip(self, smpl_model):
        """set_motion(rodrigues(pose)) then export_theta returns pose."""
        rng = np.random.default_rng(0)
        rest = np.asarray(smpl_lib.forward(
            smpl_model, jnp.zeros((24, 3)), jnp.zeros(10)).joints_rest)
        pose = rng.normal(scale=0.3, size=(24, 3))
        motion = np.stack([skeleton_lib._rodrigues_np(p) for p in pose])
        sk = skeleton_lib.Skeleton(parents=smpl_model.parents,
                                   rest_joints=rest)
        sk.set_motion(motion)
        sk.update_coords()
        np.testing.assert_allclose(sk.export_theta(), pose, atol=1e-8)

    def test_estimate_repose_identity(self, smpl_model):
        """Reposing a skeleton onto itself at zero pose gives ~zero pose."""
        rest = np.asarray(smpl_lib.forward(
            smpl_model, jnp.zeros((24, 3)), jnp.zeros(10)).joints_rest,
            np.float64)
        theta = skeleton_lib.estimate_repose(
            rest, rest, np.zeros((24, 3)), smpl_model.parents)
        # Legs/arms alignment of identical skeletons -> no rotation.
        assert np.abs(theta).max() < 1e-6

    def test_estimate_repose_moves_toward_target(self, smpl_model):
        rest = np.asarray(smpl_lib.forward(
            smpl_model, jnp.zeros((24, 3)), jnp.zeros(10)).joints_rest,
            np.float64)
        # Target: legs rotated by a small angle around z at the hips.
        rng = np.random.default_rng(1)
        target = rest.copy()
        Rz = skeleton_lib._rodrigues_np(np.array([0, 0, 0.2]))
        for leg_root in (1, 2):
            sub = skeleton_lib.Skeleton(
                parents=smpl_model.parents, rest_joints=rest).subtree(leg_root)
            for j in sub:
                if j != leg_root:
                    target[j] = target[leg_root] + Rz @ (rest[j] - rest[leg_root])
        theta = skeleton_lib.estimate_repose(
            rest, target, np.zeros((24, 3)), smpl_model.parents)
        assert np.abs(theta[[1, 2]]).max() > 0.05  # legs adjusted
        assert np.isfinite(theta).all()


class TestAlign:
    def test_align_scales_to_bbox(self):
        rng = np.random.default_rng(2)
        sv = rng.normal(size=(100, 3))
        v = sv * 250.0 + 40.0   # pixel-space version
        sJ = rng.normal(size=(24, 3)) * 0.2
        J = sJ * 250.0 + 40.0
        av, aJ = rigging.align_mesh_to_smpl(sv, v, sJ, J)
        # After alignment the bbox sizes match in x/y on average.
        s1 = (np.ptp(sv[:, 0]) / np.ptp(av[:, 0])
              + np.ptp(sv[:, 1]) / np.ptp(av[:, 1])) / 2
        # The formula adds eps to each bbox ratio (reference parity), which
        # perturbs the scale by ~scale*eps.
        assert abs(s1 - 1.0) < 1e-5
        np.testing.assert_allclose(aJ[0], sJ[0], atol=1e-9)

    def test_align_keeps_float64(self):
        """We fix the reference's float16 truncation (mesh2smpl_model:266)."""
        sv = np.random.default_rng(0).normal(size=(10, 3))
        av, aJ = rigging.align_mesh_to_smpl(
            sv, sv * 100, np.zeros((24, 3)), np.zeros((24, 3)) + 1)
        assert av.dtype == np.float64


class TestRigMesh:
    def test_rig_smpl_itself_roundtrip(self, smpl_model):
        """Rig the SMPL's own posed mesh: skinning the avatar with or_pose
        must reproduce the aligned input mesh."""
        rng = np.random.default_rng(3)
        # The repose heuristic zeroes the pose above joint 12 and flattens
        # z for joints 13+ (gen_re_pose parity), so the exact roundtrip
        # invariant holds for leg-only poses; arm chains are approximated.
        pose = np.zeros((24, 3))
        pose[[1, 2, 4, 5]] = rng.normal(scale=0.25, size=(4, 3))
        shape = rng.normal(scale=0.5, size=(10,))
        posed = smpl_lib.forward(
            smpl_model, jnp.asarray(pose, jnp.float32),
            jnp.asarray(shape, jnp.float32))
        verts = np.asarray(posed.verts, np.float64)
        joints = np.asarray(posed.joints_posed, np.float64)
        weights = np.asarray(smpl_model.weights, np.float64)
        color = np.full_like(verts, 128.0)

        avatar = rigging.rig_mesh(
            smpl_model, verts, color, smpl_model.faces, weights,
            pose, shape, joints)

        assert np.isfinite(avatar.v_template).all()
        # Skin with the recovered original pose: should land near the
        # aligned input vertices.
        out = np.asarray(rigging.animate(avatar, avatar.or_pose[None]))[0]
        aligned, _ = rigging.align_mesh_to_smpl(verts, verts, joints, joints)
        err = np.abs(out - aligned).mean()
        scale = verts.std()
        assert err < 0.15 * scale, f"roundtrip err {err} vs scale {scale}"

    def test_animate_batch_shapes(self, smpl_model):
        rng = np.random.default_rng(5)
        avatar = rigging.RiggedAvatar(
            v_template=rng.normal(size=(200, 3)),
            weights=np.abs(rng.normal(size=(200, 24))) + 0.01,
            color=np.zeros((200, 3)),
            faces=np.zeros((10, 3), np.int64),
            joints=rng.normal(size=(24, 3)),
            parents=smpl_model.parents,
            or_pose=np.zeros((24, 3)),
            or_shape=np.zeros(10))
        poses = rng.normal(scale=0.1, size=(7, 24, 3))
        trans = rng.normal(size=(7, 3))
        out = np.asarray(rigging.animate(avatar, poses, trans))
        assert out.shape == (7, 200, 3)
        assert np.isfinite(out).all()

    def test_ignored_joints_zeroed(self, smpl_model):
        """Posing only an ignored joint leaves the avatar unchanged."""
        rng = np.random.default_rng(6)
        avatar = rigging.RiggedAvatar(
            v_template=rng.normal(size=(50, 3)),
            weights=np.abs(rng.normal(size=(50, 24))) + 0.01,
            color=np.zeros((50, 3)),
            faces=np.zeros((4, 3), np.int64),
            joints=rng.normal(size=(24, 3)),
            parents=smpl_model.parents,
            or_pose=np.zeros((24, 3)),
            or_shape=np.zeros(10))
        p0 = np.zeros((1, 24, 3))
        p1 = np.zeros((1, 24, 3))
        p1[0, 22] = [1.0, 0.5, 0.2]   # hand joint: must be ignored
        o0 = np.asarray(rigging.animate(avatar, p0))
        o1 = np.asarray(rigging.animate(avatar, p1))
        np.testing.assert_allclose(o0, o1, atol=1e-7)

    def test_save_load_roundtrip(self, smpl_model, tmp_path):
        rng = np.random.default_rng(7)
        avatar = rigging.RiggedAvatar(
            v_template=rng.normal(size=(30, 3)),
            weights=np.abs(rng.normal(size=(30, 24))),
            color=rng.normal(size=(30, 3)),
            faces=rng.integers(0, 30, (8, 3)),
            joints=rng.normal(size=(24, 3)),
            parents=smpl_model.parents,
            or_pose=rng.normal(size=(24, 3)),
            or_shape=rng.normal(size=(10,)))
        p = str(tmp_path / "avatar.pkl")
        rigging.save_avatar(p, avatar)
        loaded = rigging.load_avatar(p)
        np.testing.assert_allclose(loaded.v_template, avatar.v_template)
        np.testing.assert_allclose(loaded.joints, avatar.joints)
        assert loaded.parents == avatar.parents


class TestInverseLbsNp:
    def test_matches_device_inverse_lbs(self):
        """Host f64 inverse LBS == core.lbs.inverse_lbs (f32 device) on
        random blended transforms."""
        rng = np.random.default_rng(0)
        V, J = 500, 24
        w = rng.dirichlet(np.ones(4), size=V)
        cols = rng.integers(0, J, size=(V, 4))
        weights = np.zeros((V, J))
        np.put_along_axis(weights, cols, w, axis=1)
        # Random small rotations + translations as rest-relative 4x4s.
        from scipy.spatial.transform import Rotation
        G = np.tile(np.eye(4), (J, 1, 1))
        G[:, :3, :3] = Rotation.from_rotvec(
            0.3 * rng.normal(size=(J, 3))).as_matrix()
        G[:, :3, 3] = 0.1 * rng.normal(size=(J, 3))
        verts = rng.normal(size=(V, 3))
        dev = np.asarray(lbs_lib.inverse_lbs(
            jnp.asarray(verts, jnp.float32), jnp.asarray(weights, jnp.float32),
            jnp.asarray(G, jnp.float32)))
        host = rigging.inverse_lbs_np(verts, weights, G)
        np.testing.assert_allclose(host, dev, atol=5e-5)

    def test_roundtrip_through_forward_lbs(self):
        """inverse_lbs_np(lbs(v)) == v."""
        rng = np.random.default_rng(3)
        V, J = 300, 24
        weights = rng.dirichlet(np.ones(J), size=V)
        from scipy.spatial.transform import Rotation
        G = np.tile(np.eye(4), (J, 1, 1))
        G[:, :3, :3] = Rotation.from_rotvec(
            0.4 * rng.normal(size=(J, 3))).as_matrix()
        G[:, :3, 3] = 0.2 * rng.normal(size=(J, 3))
        rest = rng.normal(size=(V, 3))
        T = (weights @ G.reshape(J, 16)).reshape(V, 4, 4)
        posed = np.einsum("vij,vj->vi", T[:, :3, :3], rest) + T[:, :3, 3]
        back = rigging.inverse_lbs_np(posed, weights, G)
        np.testing.assert_allclose(back, rest, atol=1e-9)
