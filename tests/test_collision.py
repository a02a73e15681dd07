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
def test_fit_with_interpenetration_runs():
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
        coll_loss_weights=(1.0,) * 5,
        data_weights=(1.0,), body_pose_prior_weights=(4.78,),
        shape_weights=(5.0,), hand_pose_prior_weights=(4.78,),
        hand_joints_weights=(0.0,))
    out = smplify.fit_frame(model, kps, center, cfg)
    assert np.isfinite(out.loss)
    assert np.all(np.isfinite(out.pose))


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
