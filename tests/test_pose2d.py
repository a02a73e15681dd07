"""2D keypoint detector: decoding exactness, training, JSON contract."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tpubody.models import pose2d


class TestSoftArgmax:
    def test_decodes_gaussian_peaks_exactly(self):
        """Soft-argmax over a symmetric Gaussian recovers its center."""
        h = w = 32
        K = 3
        centers = np.array([[5.0, 7.0], [20.0, 11.0], [15.5, 28.25]])
        yy, xx = np.mgrid[0:h, 0:w]
        maps = np.zeros((1, h, w, K), np.float32)
        for k, (cx, cy) in enumerate(centers):
            maps[0, :, :, k] = 20.0 * np.exp(
                -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 2.0 ** 2))
        out = np.asarray(pose2d.soft_argmax(jnp.asarray(maps)))
        stride = pose2d.HEATMAP_STRIDE
        for k, (cx, cy) in enumerate(centers):
            np.testing.assert_allclose(
                out[0, k, 0], cx * stride + (stride - 1) / 2, atol=0.6)
            np.testing.assert_allclose(
                out[0, k, 1], cy * stride + (stride - 1) / 2, atol=0.6)
        assert (out[0, :, 2] > 0.5).all()   # sharp peaks -> confident

    def test_targets_roundtrip_through_decoder(self):
        """make_target_heatmaps(kp) decoded by soft_argmax gives kp back."""
        rng = np.random.default_rng(0)
        kp = np.concatenate([
            rng.uniform(20, 100, (1, 8, 2)), np.ones((1, 8, 1))],
            axis=-1).astype(np.float32)
        maps = pose2d.make_target_heatmaps(jnp.asarray(kp), (32, 32))
        dec = np.asarray(pose2d.soft_argmax(jnp.log(maps + 1e-9)))
        np.testing.assert_allclose(dec[0, :, :2], kp[0, :, :2], atol=1.0)


class TestModel:
    def test_forward_shapes(self):
        model, vs = pose2d.create_pose2d(features=8, image_size=32,
                                         init="shape")
        out = pose2d.detect(model, vs,
                            jnp.zeros((2, 32, 32, 3), jnp.float32))
        assert out.keypoints.shape == (2, 67, 3)
        assert out.heatmaps.shape == (2, 8, 8, 67)

    @pytest.mark.slow
    def test_overfits_single_example(self):
        """A few steps on one image moves predictions toward the target —
        the training loop is wired correctly end to end."""
        model, vs = pose2d.create_pose2d(
            n_keypoints=4, features=8, image_size=32)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
        kp = jnp.asarray(np.concatenate(
            [rng.uniform(6, 26, (1, 4, 2)), np.ones((1, 4, 1))],
            axis=-1), jnp.float32)
        tx = optax.adam(1e-2)
        params = vs
        opt_state = tx.init(params)
        step = jax.jit(pose2d.make_train_step(model, tx))
        losses = []
        for _ in range(120):
            params, opt_state, loss = step(params, opt_state, img, kp)
            losses.append(float(loss))
        # CE against soft Gaussian targets floors at the target entropy,
        # so assert absolute progress + decode accuracy, not loss halving.
        assert losses[-1] < losses[0] - 0.3
        dec = np.asarray(pose2d.detect(model, params, img).keypoints)
        err = np.abs(dec[0, :, :2] - np.asarray(kp)[0, :, :2]).max()
        assert err < 6.0     # within ~1.5 heatmap cells

    def test_masked_keypoints_do_not_contribute(self):
        # shape-init: loss masking only needs some params, not trained ones,
        # and the real init costs ~12 s of XLA:CPU compile.
        model, vs = pose2d.create_pose2d(
            n_keypoints=2, features=8, image_size=32, init="shape")
        img = jnp.zeros((1, 32, 32, 3))
        kp_all = jnp.asarray([[[8.0, 8.0, 1.0], [20.0, 20.0, 0.0]]])
        logits = model.apply(vs, img)
        l_masked = pose2d.heatmap_loss(logits, kp_all)
        kp_one = jnp.asarray([[[8.0, 8.0, 1.0], [20.0, 20.0, -1.0]]])
        np.testing.assert_allclose(
            float(l_masked), float(pose2d.heatmap_loss(logits, kp_one)),
            rtol=1e-6)


class TestOpenPoseContract:
    def test_json_roundtrip_through_keypoints_reader(self, tmp_path):
        """Detector output -> OpenPose JSON -> fit.keypoints reader."""
        from tpubody.fit import keypoints as kp_lib
        rng = np.random.default_rng(2)
        kp = np.concatenate([
            rng.uniform(0, 256, (67, 2)), np.ones((67, 1))],
            axis=-1).astype(np.float64)
        person = pose2d.keypoints_to_openpose(kp)
        p = tmp_path / "0_keypoints.json"
        with open(p, "w") as f:
            json.dump({"version": 1.3, "people": [person]}, f)
        loaded = kp_lib.read_openpose_json(str(p))
        np.testing.assert_allclose(loaded.keypoints, kp, atol=1e-9)
