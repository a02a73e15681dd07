"""Self-interpenetration penalty (reference fitting.py:426-442 capability)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from tpubody.fit import collision
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib


def _proxy(model, n=256):
    return collision.build_collision_proxy(
        np.asarray(model.v_template), np.asarray(model.weights),
        np.asarray(model.parents), n_samples=n)


class TestProxy:
    def test_rest_pose_is_penetration_free(self):
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = _proxy(model)
        loss = collision.penetration_loss(
            jnp.asarray(model.v_template), proxy)
        assert float(loss) == 0.0

    def test_allowed_excludes_same_and_adjacent_parts(self):
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = _proxy(model)
        part = np.argmax(np.asarray(model.weights), axis=1)[proxy.vertex_idx]
        parents = np.asarray(model.parents)
        ii, jj = np.nonzero(proxy.allowed)
        assert len(ii) > 0
        for a, b in zip(part[ii], part[jj]):
            assert a != b
            assert parents[a] != b and parents[b] != a

    def test_upper_triangular(self):
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = _proxy(model)
        assert not np.any(np.tril(proxy.allowed))


class TestLoss:
    def test_forced_overlap_penalized_and_differentiable(self):
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = _proxy(model)
        ii, jj = np.nonzero(proxy.allowed)
        a = int(proxy.vertex_idx[ii[0]])
        b = int(proxy.vertex_idx[jj[0]])

        def loss_at(shift):
            v = jnp.asarray(model.v_template)
            # move vertex a onto vertex b
            target = v[b] + shift
            v = v.at[a].set(target)
            return collision.penetration_loss(v, proxy)

        l0 = loss_at(jnp.zeros(3))
        assert float(l0) > 0.0
        # probe the gradient slightly off-coincidence: at d == 0 the
        # sqrt clamp makes the hinge locally flat by design
        g = jax.grad(lambda s: loss_at(s))(jnp.asarray([1e-3, 0.0, 0.0]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.linalg.norm(g)) > 0.0

    def test_loss_decreases_as_spheres_separate(self):
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = _proxy(model)
        ii, jj = np.nonzero(proxy.allowed)
        a = int(proxy.vertex_idx[ii[0]])
        b = int(proxy.vertex_idx[jj[0]])
        v = np.asarray(model.v_template).copy()
        v[a] = v[b]
        near = collision.penetration_loss(jnp.asarray(v), proxy)
        v[a] = v[b] + np.asarray([1.0, 0.0, 0.0])
        far = collision.penetration_loss(jnp.asarray(v), proxy)
        assert float(near) > float(far)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["sphere", "mesh"])
def test_fit_with_interpenetration_runs(mode):
    """fit_frame with the collision term enabled stays finite."""
    from tpubody.fit import smplify

    model = params_lib.synthetic(n_joints=52, n_verts=256, seed=0)
    state = smpl_lib.forward(model, jnp.zeros((52, 3)), jnp.zeros(10))
    from tpubody.fit import joints as joints_lib
    j = joints_lib.openpose_joints(
        state.verts, state.joints_posed,
        vertex_ids=joints_lib.extra_vertex_ids(model.num_verts))
    center = np.asarray([112.0, 112.0])
    proj = np.asarray(j[:, :2] / (j[:, 2:3] + 3.0) * 500.0 + center)
    kps = np.concatenate([proj, np.ones((proj.shape[0], 1))], axis=1)

    cfg = smplify.FitConfig(
        focal_length=500.0, maxiters=3, use_vposer=True,
        interpenetration=True, coll_n_samples=128,
        coll_mode=mode, coll_n_faces=128,
        coll_loss_weights=(1.0,) * 5,
        data_weights=(1.0,), body_pose_prior_weights=(4.78,),
        shape_weights=(5.0,), hand_pose_prior_weights=(4.78,),
        hand_joints_weights=(0.0,))
    out = smplify.fit_frame(model, kps, center, cfg)
    assert np.isfinite(out.loss)
    assert np.all(np.isfinite(out.pose))


class TestMeshCollision:
    """Dense cone-distance-field term (fit.mesh_collision) — the
    TPU-native equivalent of the reference's BVH + distance-field penalty
    (lib/Gen_SMPLH/fitting.py:404-442)."""

    def _mproxy(self, model, n_faces=256, n_verts=256, cone_scale=2.0):
        from tpubody.fit import mesh_collision
        return mesh_collision.build_mesh_collision(
            np.asarray(model.v_template), np.asarray(model.faces),
            np.asarray(model.weights), np.asarray(model.parents),
            n_faces=n_faces, n_verts=n_verts, cone_scale=cone_scale)

    def test_rest_pose_is_penalty_free(self):
        from tpubody.fit import mesh_collision
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = self._mproxy(model)
        loss = mesh_collision.mesh_penetration_loss(
            jnp.asarray(model.v_template), proxy)
        assert float(loss) == 0.0

    def test_vertex_never_tested_against_own_face(self):
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = self._mproxy(model)
        own = np.any(
            proxy.face_vids[:, :, None] == proxy.vertex_idx[None, None],
            axis=1)
        assert not np.any(proxy.allowed & own)

    @pytest.mark.slow  # LBS fwd+grad compile dominates (~15 s on 1-core CPU)
    def test_folded_limb_penalized_and_differentiable(self):
        from tpubody.fit import mesh_collision
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = self._mproxy(model)
        parents = np.asarray(model.parents)
        depth = np.zeros(24, int)
        for i in range(1, 24):
            depth[i] = depth[parents[i]] + 1
        pose = np.zeros((24, 3))
        pose[depth >= 2] = [0.0, 0.0, np.pi * 0.9]

        def loss_at(p):
            state = smpl_lib.forward(model, p, jnp.zeros(10))
            return mesh_collision.mesh_penetration_loss(state.verts, proxy)

        l_folded = loss_at(jnp.asarray(pose, jnp.float32))
        assert float(l_folded) > 0.0
        g = jax.grad(loss_at)(jnp.asarray(pose, jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.linalg.norm(g)) > 0.0

    def test_loss_decreases_as_bodies_separate(self):
        from tpubody.fit import mesh_collision
        model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
        proxy = self._mproxy(model)
        v = np.asarray(model.v_template)
        # slam a duplicate of the body's far half into its near half by
        # collapsing x: creates real face/vertex penetrations
        squashed = v.copy()
        squashed[:, 0] *= 0.05
        near = mesh_collision.mesh_penetration_loss(
            jnp.asarray(squashed, jnp.float32), proxy)
        far = mesh_collision.mesh_penetration_loss(
            jnp.asarray(v, jnp.float32), proxy)
        assert float(near) > float(far)

    def test_conf_yaml_selects_mesh_mode_and_maps_cone_height(self, tmp_path):
        from tpubody.pipelines import gen_smplh
        p = tmp_path / "conf.yaml"
        p.write_text("interpenetration: true\ndf_cone_height: 0.25\n")
        cfg = gen_smplh.load_config(str(p))
        assert cfg.interpenetration
        assert cfg.coll_mode == "mesh"
        assert abs(cfg.coll_cone_scale - 1.0) < 1e-9


def test_folded_limb_increases_penetration():
    """Pose-induced interpenetration: folding a deep limb back onto its
    ancestors' region must raise the proxy penalty above rest pose — the
    behavior the reference's BVH collision term exists to reject
    (lib/Gen_SMPLH/fitting.py:404-425)."""
    model = params_lib.synthetic(n_joints=24, n_verts=512, seed=0)
    proxy = _proxy(model)
    rest = smpl_lib.forward(model, jnp.zeros((24, 3)), jnp.zeros(10))
    l_rest = float(collision.penetration_loss(rest.verts, proxy))

    # Fold every deep joint (far from the root chain) by ~pi: subtrees
    # sweep back through the body volume.
    parents = np.asarray(model.parents)
    depth = np.zeros(24, int)
    for i in range(1, 24):
        depth[i] = depth[parents[i]] + 1
    pose = np.zeros((24, 3))
    pose[depth >= 2] = [0.0, 0.0, np.pi * 0.9]
    folded = smpl_lib.forward(model, jnp.asarray(pose, jnp.float32),
                              jnp.zeros(10))
    l_folded = float(collision.penetration_loss(folded.verts, proxy))
    assert l_folded > l_rest * 1.5 + 1e-6, (l_rest, l_folded)
