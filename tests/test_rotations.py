import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpubody.core import rotations as rot
from tests.oracle.np_body import rodrigues_np


def test_rodrigues_identity_at_zero():
    R = rot.rodrigues(jnp.zeros((5, 3)))
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-6)


def test_rodrigues_vs_oracle():
    rng = np.random.default_rng(0)
    r = rng.normal(scale=1.5, size=(64, 3))
    ours = np.asarray(rot.rodrigues(jnp.asarray(r, dtype=jnp.float32)))
    ref = rodrigues_np(r)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_rodrigues_known_90deg():
    # 90 degrees about z: x -> y.
    r = jnp.asarray([0.0, 0.0, np.pi / 2])
    R = np.asarray(rot.rodrigues(r))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_rodrigues_gradient_finite_at_zero():
    g = jax.grad(lambda r: jnp.sum(rot.rodrigues(r)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_quat_roundtrip():
    rng = np.random.default_rng(1)
    r = rng.normal(scale=1.0, size=(32, 3))
    R = rot.rodrigues(jnp.asarray(r, jnp.float32))
    q = rot.rotmat_to_quat(R)
    R2 = rot.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_axis_angle_quat_consistency():
    rng = np.random.default_rng(2)
    r = rng.normal(scale=0.8, size=(16, 3))
    q = rot.axis_angle_to_quat(jnp.asarray(r, jnp.float32))
    R_via_q = rot.quat_to_rotmat(q)
    R_direct = rot.rodrigues(jnp.asarray(r, jnp.float32))
    np.testing.assert_allclose(np.asarray(R_via_q), np.asarray(R_direct), atol=1e-5)


def test_rot6d_roundtrip():
    rng = np.random.default_rng(3)
    r = rng.normal(scale=1.2, size=(48, 3))
    R = rot.rodrigues(jnp.asarray(r, jnp.float32))
    six = rot.rotmat_to_rot6d(R)
    R2 = rot.rot6d_to_rotmat(six)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_rot6d_orthonormal_output():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(20, 6)), jnp.float32)
    R = np.asarray(rot.rot6d_to_rotmat(x))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ np.transpose(R, (0, 2, 1)), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(20), atol=1e-5)


def test_rotmat_to_axis_angle_roundtrip():
    rng = np.random.default_rng(5)
    r = rng.normal(scale=1.0, size=(40, 3))
    R = rot.rodrigues(jnp.asarray(r, jnp.float32))
    aa = rot.rotmat_to_axis_angle(R)
    R2 = rot.rodrigues(aa)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


class TestScipyOracle:
    """Second, independent oracle: scipy.spatial.transform.Rotation must
    agree with every conversion (axis-angle, quaternion, matrix)."""

    def test_rodrigues_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(0)
        aa = rng.normal(scale=1.2, size=(32, 3))
        ours = np.asarray(rot.rodrigues(jnp.asarray(aa, jnp.float32)))
        theirs = Rotation.from_rotvec(aa).as_matrix()
        # rodrigues carries an epsilon guard inside sqrt (grad safety at
        # theta=0) that perturbs the 7th decimal.
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_quat_to_rotmat_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(1)
        q = rng.normal(size=(16, 4))
        ours = np.asarray(rot.quat_to_rotmat(
            jnp.asarray(q, jnp.float32)))
        # ours is (w,x,y,z); scipy wants (x,y,z,w)
        theirs = Rotation.from_quat(
            np.concatenate([q[:, 1:], q[:, :1]], axis=1)).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_rotmat_to_axis_angle_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(2)
        R = Rotation.from_rotvec(rng.normal(scale=0.9, size=(16, 3)))
        ours = np.asarray(rot.rotmat_to_axis_angle(
            jnp.asarray(R.as_matrix(), jnp.float32)))
        np.testing.assert_allclose(ours, R.as_rotvec(), atol=1e-5)

    def test_axis_angle_to_quat_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(3)
        aa = rng.normal(scale=1.1, size=(16, 3))
        ours = np.asarray(rot.axis_angle_to_quat(
            jnp.asarray(aa, jnp.float32)))
        theirs = Rotation.from_rotvec(aa).as_quat()  # (x,y,z,w)
        theirs_wxyz = np.concatenate([theirs[:, 3:], theirs[:, :3]], axis=1)
        # Quaternions are sign-ambiguous; align signs before comparing.
        sign = np.sign(np.sum(ours * theirs_wxyz, axis=1, keepdims=True))
        np.testing.assert_allclose(ours, theirs_wxyz * sign, atol=1e-5)
