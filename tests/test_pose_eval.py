"""MPJPE / PA-MPJPE / PVE evaluation metrics."""
import numpy as np
import jax.numpy as jnp

from tpubody.utils import pose_eval


def _rand_rot(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


class TestProcrustes:
    def test_exact_recovery_of_similarity_transform(self):
        rng = np.random.default_rng(0)
        gt = rng.normal(size=(17, 3))
        R = _rand_rot(rng)
        pred = 0.37 * gt @ R.T + np.array([1.0, -2.0, 0.5])
        aligned = np.asarray(pose_eval.procrustes_align(
            jnp.asarray(pred), jnp.asarray(gt)))
        np.testing.assert_allclose(aligned, gt, atol=1e-5)

    def test_reflection_not_used(self):
        """A mirrored prediction must NOT be fixed by an improper rotation:
        alignment stays a proper rotation, so error remains large."""
        rng = np.random.default_rng(1)
        gt = rng.normal(size=(24, 3))
        pred = gt * np.array([-1.0, 1.0, 1.0])  # reflection
        err = float(pose_eval.pa_mpjpe(jnp.asarray(pred)[None],
                                       jnp.asarray(gt)[None])[0])
        assert err > 0.1

    def test_batched_matches_single(self):
        rng = np.random.default_rng(2)
        gt = rng.normal(size=(4, 10, 3))
        pred = gt + 0.1 * rng.normal(size=(4, 10, 3))
        batched = np.asarray(pose_eval.pa_mpjpe(
            jnp.asarray(pred), jnp.asarray(gt)))
        singles = [float(pose_eval.pa_mpjpe(
            jnp.asarray(pred[i]), jnp.asarray(gt[i]))) for i in range(4)]
        np.testing.assert_allclose(batched, singles, rtol=1e-5)


class TestMPJPE:
    def test_zero_for_identical(self):
        rng = np.random.default_rng(3)
        j = jnp.asarray(rng.normal(size=(2, 24, 3)))
        assert float(pose_eval.mpjpe(j, j).max()) == 0.0

    def test_root_centering_removes_global_offset(self):
        rng = np.random.default_rng(4)
        gt = rng.normal(size=(24, 3))
        pred = gt + np.array([5.0, 5.0, 5.0])  # pure translation
        assert float(pose_eval.mpjpe(
            jnp.asarray(pred), jnp.asarray(gt))) < 1e-6
        # without centering, the offset shows
        assert float(pose_eval.mpjpe(
            jnp.asarray(pred), jnp.asarray(gt), root=None)) > 1.0

    def test_known_error_magnitude(self):
        gt = np.zeros((1, 4, 3))
        pred = np.zeros((1, 4, 3))
        pred[0, :, 0] = 0.05  # every joint off by 5 cm in x
        # root-centering removes a constant offset -> use root=None
        err = float(pose_eval.mpjpe(
            jnp.asarray(pred), jnp.asarray(gt), root=None)[0])
        np.testing.assert_allclose(err, 0.05, rtol=1e-6)

    def test_pa_leq_mpjpe(self):
        """Procrustes alignment can only reduce the error."""
        rng = np.random.default_rng(5)
        gt = rng.normal(size=(6, 24, 3))
        pred = gt @ _rand_rot(rng).T + 0.03 * rng.normal(size=(6, 24, 3))
        m = np.asarray(pose_eval.mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        pa = np.asarray(pose_eval.pa_mpjpe(jnp.asarray(pred),
                                           jnp.asarray(gt)))
        assert (pa <= m + 1e-6).all()


def test_pve_and_evaluate_batch():
    rng = np.random.default_rng(6)
    gt = rng.normal(size=(3, 50, 3))
    pred = gt + 0.01
    v = np.asarray(pose_eval.pve(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(v, np.sqrt(3) * 0.01, rtol=1e-5)
    out = pose_eval.evaluate_batch(jnp.asarray(pred), jnp.asarray(gt))
    assert out["mpjpe"].shape == (3,) and out["pa_mpjpe"].shape == (3,)
    assert np.isfinite(np.asarray(out["pa_mpjpe"])).all()
