import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpubody.core import lbs as lbs_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib
from tests.oracle.np_body import lbs_np


@pytest.fixture(scope="module", params=[24, 52], ids=["smpl24", "smplh52"])
def model_pair(request):
    n_joints = request.param
    raw = params_lib.synthetic_numpy(n_joints=n_joints, n_verts=431, seed=7)
    model = params_lib.synthetic(n_joints=n_joints, n_verts=431, seed=7)
    return raw, model


def _random_inputs(n_joints, seed=11):
    rng = np.random.default_rng(seed)
    pose = rng.normal(scale=0.3, size=(n_joints, 3))
    beta = rng.normal(scale=1.0, size=(10,))
    trans = rng.normal(scale=0.5, size=(3,))
    return pose, beta, trans


def test_forward_matches_oracle(model_pair):
    raw, model = model_pair
    pose, beta, trans = _random_inputs(model.num_joints)
    ref = lbs_np(raw, pose, beta, trans)
    out = smpl_lib.forward(
        model, jnp.asarray(pose, jnp.float32), jnp.asarray(beta, jnp.float32),
        jnp.asarray(trans, jnp.float32)
    )
    # BASELINE target: per-vertex error < 1e-4 vs the float64 oracle.
    err = np.abs(np.asarray(out.verts) - ref["verts"]).max()
    assert err < 1e-4, f"max vertex err {err}"
    jerr = np.abs(np.asarray(out.joints_posed) - ref["joints_posed"]).max()
    assert jerr < 1e-4, f"max joint err {jerr}"


def test_forward_zero_pose_is_shaped_template(model_pair):
    raw, model = model_pair
    beta = np.zeros(10)
    out = smpl_lib.forward(
        model, jnp.zeros((model.num_joints, 3)), jnp.asarray(beta, jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(out.verts), np.asarray(model.v_template), atol=1e-5
    )


def test_inverse_lbs_roundtrip(model_pair):
    raw, model = model_pair
    pose, beta, trans = _random_inputs(model.num_joints, seed=3)
    state = smpl_lib.forward(
        model, jnp.asarray(pose, jnp.float32), jnp.asarray(beta, jnp.float32),
        jnp.asarray(trans, jnp.float32)
    )
    unposed = smpl_lib.unpose(model, state.verts, state, jnp.asarray(trans, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(unposed), np.asarray(state.v_posed), atol=2e-5
    )


def test_affine_inverse_matches_linalg(model_pair):
    raw, model = model_pair
    pose, beta, trans = _random_inputs(model.num_joints, seed=5)
    ref = lbs_np(raw, pose, beta, trans)
    T = jnp.asarray(ref["T"], jnp.float32)
    Tinv = np.asarray(lbs_lib.affine_inverse(T))
    np.testing.assert_allclose(Tinv, ref["T_inverse"], atol=5e-4, rtol=1e-3)


def test_forward_batch_consistent(model_pair):
    raw, model = model_pair
    rng = np.random.default_rng(21)
    F = 6
    poses = jnp.asarray(rng.normal(scale=0.25, size=(F, model.num_joints, 3)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(10,)), jnp.float32)
    trans = jnp.asarray(rng.normal(size=(F, 3)), jnp.float32)
    batched = smpl_lib.forward_batch(model, poses, beta, trans)
    for i in range(F):
        single = smpl_lib.forward(model, poses[i], beta, trans[i])
        np.testing.assert_allclose(
            np.asarray(batched.verts[i]), np.asarray(single.verts), atol=1e-5
        )


def test_forward_jit_compiles(model_pair):
    _, model = model_pair
    pose = jnp.zeros((model.num_joints, 3))
    beta = jnp.zeros((10,))
    fn = jax.jit(lambda p, b: smpl_lib.forward(model, p, b).verts)
    v1 = fn(pose, beta)
    v2 = fn(pose + 0.1, beta)
    assert v1.shape == (model.num_verts, 3)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))


def test_regress_joints(model_pair):
    raw, model = model_pair
    pose, beta, trans = _random_inputs(model.num_joints, seed=9)
    ref = lbs_np(raw, pose, beta, trans)
    out = smpl_lib.forward(
        model, jnp.asarray(pose, jnp.float32), jnp.asarray(beta, jnp.float32),
        jnp.asarray(trans, jnp.float32)
    )
    j3d = smpl_lib.regress_joints(model, out.verts)
    ref_j3d = raw["j_regressor"] @ ref["verts"]
    np.testing.assert_allclose(np.asarray(j3d), ref_j3d, atol=1e-4)


def test_divide_face_partition():
    model = params_lib.synthetic(n_joints=24, n_verts=200, seed=1)
    verts = np.asarray(model.v_template)
    faces = model.faces
    ff, fv, fi, bf, bv, bi = smpl_lib.divide_face(verts, faces)
    assert ff.shape[0] + bf.shape[0] == faces.shape[0]
    # Re-indexed faces must reference their own vertex arrays.
    if ff.size:
        assert ff.max() < fv.shape[0]
        np.testing.assert_allclose(fv[ff], verts[faces[np.asarray(
            smpl_lib.face_normals_z(jnp.asarray(verts), faces)) <= 0]])
    if bf.size:
        assert bf.max() < bv.shape[0]
