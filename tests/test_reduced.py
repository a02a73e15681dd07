"""Exact reduced fitting model (params.restrict_model + FitConfig.reduce_verts).

The staged fit only reads joints + a few surface vertices; restrict_model
builds a tiny model whose LBS outputs are algebraically identical on those
rows (virtual joint rows carry the collapsed J_regressor).  These tests pin
the equality against the full forward.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.fit import joints as joints_lib
from tpubody.fit import smplify
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib


def _rand_pose_beta(nj, seed=0, n_beta=10):
    r = np.random.default_rng(seed)
    pose = jnp.asarray(r.normal(scale=0.3, size=(nj, 3)), jnp.float32)
    beta = jnp.asarray(r.normal(size=(n_beta,)), jnp.float32)
    return pose, beta


@pytest.mark.parametrize("nj", [24, 52])
def test_restrict_model_matches_full_forward(nj):
    model = params_lib.synthetic(n_joints=nj, n_verts=300, seed=1)
    ids = np.array([3, 17, 3, 150, 299, 42], np.int64)  # incl. duplicate
    reduced, rows = params_lib.restrict_model(model, ids)
    assert reduced.num_verts == nj + 5        # 5 unique ids + J joint rows
    assert rows[0] == rows[2]                 # duplicates share a row

    pose, beta = _rand_pose_beta(nj, seed=nj)
    full = smpl_lib.forward(model, pose, beta)
    red = smpl_lib.forward(reduced, pose, beta)

    np.testing.assert_allclose(np.asarray(red.joints_rest),
                               np.asarray(full.joints_rest), atol=1e-5)
    np.testing.assert_allclose(np.asarray(red.joints_posed),
                               np.asarray(full.joints_posed), atol=1e-5)
    np.testing.assert_allclose(np.asarray(red.rel_transforms),
                               np.asarray(full.rel_transforms), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(red.verts)[np.asarray(rows)],
        np.asarray(full.verts)[ids], atol=1e-5)
    # Virtual joint rows skin to the posed joints themselves.
    np.testing.assert_allclose(np.asarray(red.verts)[:nj],
                               np.asarray(red.joints_posed), atol=1e-5)


@pytest.mark.parametrize("model_type,nj", [("smplh", 52), ("smplx", 55)])
def test_reduced_family_projected_joints_match(model_type, nj):
    """_setup_family(reduce_verts=True) yields the same projected OpenPose
    joints (the whole fit objective's data term) as the full model —
    including SMPL-X barycentric face landmarks remapped through rows."""
    model = params_lib.load_or_synthetic(
        model_type, n_joints=nj, n_verts=400, seed=3)
    kw = dict(model_type=model_type)
    if model_type == "smplx":
        kw.update(use_face=True, use_face_contour=True)
    cfg_full = smplify.FitConfig(reduce_verts=False, **kw)
    cfg_red = smplify.FitConfig(reduce_verts=True, **kw)
    fam_full = smplify._setup_family(model, cfg_full)
    fam_red = smplify._setup_family(model, cfg_red)
    assert fam_red.fit_model.num_verts < model.num_verts

    pose, beta = _rand_pose_beta(nj, seed=7)

    def proj(fam, cfg):
        state = smpl_lib.forward(
            fam.fit_model, pose,
            jnp.concatenate([beta, jnp.zeros(fam.n_expr)]))
        return joints_lib.openpose_joints(
            state.verts, state.joints_posed, use_hands=fam.use_hands,
            vertex_ids=fam.vertex_ids, lmk=fam.lmk, use_face=fam.use_face,
            use_face_contour=fam.use_face_contour)

    np.testing.assert_allclose(np.asarray(proj(fam_red, cfg_red)),
                               np.asarray(proj(fam_full, cfg_full)),
                               atol=1e-5)


@pytest.mark.parametrize("coll_mode", ["sphere", "mesh"])
def test_reduced_collision_matches_full(coll_mode):
    """Interpenetration fits reduce too: the remapped proxy computes the
    same penalty on reduced verts as the full proxy on full verts."""
    model = params_lib.synthetic(n_joints=24, n_verts=300, seed=0)
    kw = dict(model_type="smpl", interpenetration=True,
              coll_mode=coll_mode, coll_n_samples=64, coll_n_faces=64)
    fam_red = smplify._setup_family(
        model, smplify.FitConfig(reduce_verts=True, **kw))
    fam_full = smplify._setup_family(
        model, smplify.FitConfig(reduce_verts=False, **kw))
    assert fam_red.fit_model.num_verts < model.num_verts

    pose, beta = _rand_pose_beta(24, seed=5)
    v_red = smpl_lib.forward(fam_red.fit_model, pose, beta).verts
    v_full = smpl_lib.forward(fam_full.fit_model, pose, beta).verts
    np.testing.assert_allclose(float(fam_red.coll_fn(v_red)),
                               float(fam_full.coll_fn(v_full)),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fit_frame_reduced_matches_full():
    """A short staged fit lands on (numerically) the same solution with and
    without vertex reduction — same losses, same descent path."""
    model = params_lib.synthetic(n_joints=24, n_verts=300, seed=2)
    r = np.random.default_rng(0)
    kps = np.concatenate(
        [r.uniform(200, 400, (25, 2)), np.ones((25, 1))], 1).astype(
            np.float32)
    base = dict(
        model_type="smpl", maxiters=4, focal_length=500.0,
        use_vposer=False, side_view_thsh=0.0, data_weights=(1.0,),
        body_pose_prior_weights=(404.0,), shape_weights=(100.0,),
        hand_pose_prior_weights=(404.0,), hand_joints_weights=(0.0,),
        coll_loss_weights=(0.0,))
    out_red = smplify.fit_frame(
        model, kps, np.array([320.0, 240.0]),
        smplify.FitConfig(reduce_verts=True, **base))
    out_full = smplify.fit_frame(
        model, kps, np.array([320.0, 240.0]),
        smplify.FitConfig(reduce_verts=False, **base))
    assert np.isfinite(out_red.loss)
    np.testing.assert_allclose(out_red.loss, out_full.loss,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out_red.pose, out_full.pose, atol=5e-3)
    np.testing.assert_allclose(out_red.camera_translation,
                               out_full.camera_translation,
                               rtol=1e-3, atol=1e-3)
