import numpy as np
import jax.numpy as jnp
import pytest

from tpubody.image import ops


class TestResizeCrop:
    def test_resize_shape(self):
        img = jnp.ones((64, 48, 3))
        out = ops.resize_image(img, 32, 24)
        assert out.shape == (32, 24, 3)

    def test_resize_batch(self):
        img = jnp.ones((2, 64, 48, 3))
        out = ops.resize_image(img, 16, 16)
        assert out.shape == (2, 16, 16, 3)

    def test_scale_and_crop_center(self):
        img = np.zeros((100, 100, 3), np.float32)
        img[40:60, 40:60] = 1.0
        out = ops.scale_and_crop(img, (50, 50), 0.2, size=32)
        # The crop window is 40px around (50,50) -> white square occupies
        # the middle half.
        assert out.shape == (32, 32, 3)
        assert out[16, 16, 0] > 0.9
        assert out[1, 1, 0] < 0.1

    def test_scale_and_crop_pads_edges(self):
        img = np.full((50, 50, 3), 7.0, np.float32)
        out = ops.scale_and_crop(img, (0, 0), 0.5, size=16)  # mostly outside
        assert out.shape == (16, 16, 3)
        np.testing.assert_allclose(out, 7.0, atol=1e-4)

    def test_normalize_for_hmr(self):
        img = np.full((4, 4, 3), 255, np.uint8)
        out = ops.normalize_for_hmr(img)
        np.testing.assert_allclose(
            out[0, 0], (1.0 - np.array([0.485, 0.456, 0.406]))
            / np.array([0.229, 0.224, 0.225]), atol=1e-5)

    def test_crop_from_keypoints(self):
        kp = np.array([[10, 10, 1], [90, 50, 1], [50, 90, 0.0]])
        center, scale = ops.crop_from_keypoints(kp)
        np.testing.assert_allclose(center, [50, 30])
        assert abs(scale - 1.2 * 80 / 200) < 1e-6


class TestDraw:
    def test_draw_keypoints_marks_pixels(self):
        img = np.zeros((32, 32, 3), np.uint8)
        kp = np.array([[16, 16, 1.0], [5, 5, 0.0]])
        out = ops.draw_keypoints(img, kp, radius=2, color=(0, 255, 0))
        assert (out[16, 16] == [0, 255, 0]).all()
        assert (out[5, 5] == 0).all()   # zero-confidence not drawn


class TestHMRPipeline:
    @pytest.mark.slow
    def test_predictor_runs(self):
        import jax
        from tpubody.pipelines import hmr_infer
        from tpubody.models import params as params_lib
        pred = hmr_infer.HMRPredictor(
            smpl_model=params_lib.synthetic(n_joints=24, n_verts=300, seed=0),
            dtype=jnp.float32)
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 224, 224, 3)),
            jnp.float32)
        out = pred(imgs)
        assert out.verts.shape == (2, 300, 3)
        assert out.cam_t.shape == (2, 3)
        assert np.isfinite(np.asarray(out.verts)).all()
        # tz positive (in front of the camera).
        assert (np.asarray(out.cam_t)[:, 2] > 0).all()

    @pytest.mark.slow
    def test_from_files(self, tmp_path):
        import cv2
        from tpubody.pipelines import hmr_infer
        from tpubody.models import params as params_lib
        p = str(tmp_path / "img.png")
        cv2.imwrite(p, np.random.default_rng(1).integers(
            0, 255, (120, 80, 3)).astype(np.uint8))
        pred = hmr_infer.HMRPredictor(
            smpl_model=params_lib.synthetic(n_joints=24, n_verts=200, seed=0),
            dtype=jnp.float32)
        out = pred.from_files([p, p])
        assert out.verts.shape[0] == 2
