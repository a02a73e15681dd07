"""SPIN-style HMR-warm-started fitting (pipelines/refine.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.fit import smplify, vposer as vposer_lib
from tpubody.fit import joints as joints_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib
from tpubody.pipelines import refine as refine_lib
from tpubody.render import camera as camera_lib


class TestCropCamToOrig:
    def test_centered_crop_keeps_xy(self):
        """Crop centered on the principal point: t_xy passes through and
        tz = f / (100 * scale * s)."""
        cam = np.array([[0.8, 0.1, -0.2]], np.float32)
        out = np.asarray(camera_lib.crop_cam_to_orig(
            cam, np.array([[512.0, 512.0]]), np.array([2.0]),
            5000.0, np.array([512.0, 512.0])))
        np.testing.assert_allclose(out[0, :2], [0.1, -0.2], atol=1e-6)
        np.testing.assert_allclose(out[0, 2], 5000.0 / (100 * 2.0 * 0.8),
                                   rtol=1e-6)

    def test_offset_crop_projects_consistently(self):
        """A 3D point rendered by the weak-persp crop camera lands on the
        same ORIGINAL-image pixel under the converted perspective camera
        (the defining property of the conversion)."""
        rng = np.random.default_rng(0)
        s, tx, ty = 0.9, 0.05, -0.1
        scale, center = 1.5, np.array([400.0, 300.0])
        img_center = np.array([512.0, 512.0])
        focal = 5000.0
        X = rng.normal(scale=0.3, size=(10, 3))

        # Weak-persp crop pixels -> original-image pixels.
        x_crop = 112.0 * s * (X[:, 0] + tx) + 112.0
        y_crop = 112.0 * s * (X[:, 1] + ty) + 112.0
        side = 200.0 * scale
        x_orig = x_crop * side / 224.0 + center[0] - side / 2.0
        y_orig = y_crop * side / 224.0 + center[1] - side / 2.0

        T = np.asarray(camera_lib.crop_cam_to_orig(
            np.array([s, tx, ty]), center, scale, focal, img_center))
        z = X[:, 2] + T[2]
        x_pers = focal * (X[:, 0] + T[0]) / z + img_center[0]
        y_pers = focal * (X[:, 1] + T[1]) / z + img_center[1]

        # Weak-persp ignores per-point depth; agreement holds to the
        # parallax error, small for shallow bodies at tz >> extent.
        assert np.abs(x_pers - x_orig).max() < 3.0
        assert np.abs(y_pers - y_orig).max() < 3.0


class TestWarmStart:
    @pytest.mark.slow  # compiles the full staged fit (~30 s on 1-core CPU)
    def test_init_params_seed_survives_zero_gradient_fit(self):
        """With all loss weights zero the optimizer has nothing to move:
        the fitted pose/betas must be exactly the warm start."""
        model = params_lib.synthetic(n_joints=52, n_verts=200, seed=0)
        rng = np.random.default_rng(1)
        body63 = rng.normal(scale=0.2, size=(63,)).astype(np.float32)
        betas = rng.normal(scale=0.3, size=(10,)).astype(np.float32)
        kps = np.zeros((67, 3), np.float32)
        kps[:, :2] = 100.0
        kps[:, 2] = 1.0
        cfg = smplify.FitConfig(
            focal_length=500.0, maxiters=2, use_vposer=False,
            use_joints_conf=True, try_both_orient=False,
            side_view_thsh=0.0,
            data_weights=(0.0,), body_pose_prior_weights=(0.0,),
            shape_weights=(0.0,), hand_pose_prior_weights=(0.0,),
            hand_joints_weights=(0.0,), coll_loss_weights=(0.0,))
        out = smplify.fit_frame(
            model, kps, np.array([100.0, 100.0]), cfg,
            init_params={"body_pose": body63, "betas": betas})
        np.testing.assert_allclose(out.pose[3:66], body63, atol=1e-5)
        np.testing.assert_allclose(out.shape, betas, atol=1e-5)

    def test_keypoint_crop_params(self):
        kp = np.zeros((67, 3))
        kp[:5, :2] = [[10, 20], [110, 20], [10, 220], [110, 220], [60, 120]]
        kp[:5, 2] = 1.0
        center, scale = refine_lib.keypoint_crop_params(kp)
        np.testing.assert_allclose(center, [60.0, 120.0])
        np.testing.assert_allclose(scale, 200.0 * 1.2 / 200.0)


@pytest.mark.slow
class TestRefinePipeline:
    def test_refine_two_images_end_to_end(self, tmp_path):
        """images + keypoints -> HMR warm start -> batched fit -> full
        artifact set (random-init HMR: mechanically valid warm start)."""
        import cv2

        from tpubody.fit import keypoints as kp_lib

        model = params_lib.synthetic(n_joints=52, n_verts=300, seed=0)
        rng = np.random.default_rng(2)
        items = []
        for i in range(2):
            d = tmp_path / f"f{i}"
            d.mkdir()
            cv2.imwrite(str(d / "img.png"),
                        rng.integers(0, 255, (120, 100, 3)).astype(np.uint8))
            body = np.concatenate(
                [rng.uniform(20, 90, (25, 2)), np.ones((25, 1))], axis=1)
            kp_lib.write_openpose_json(str(d / "kp.json"), body,
                                       np.zeros((21, 3)), np.zeros((21, 3)))
            items.append((str(d / "img.png"), str(d / "kp.json"),
                          str(d / "out")))

        cfg = smplify.FitConfig(
            focal_length=500.0, maxiters=3, try_both_orient=False,
            side_view_thsh=0.0,
            data_weights=(1.0,), body_pose_prior_weights=(57.4,),
            shape_weights=(10.0,), hand_pose_prior_weights=(57.4,),
            hand_joints_weights=(0.0,), coll_loss_weights=(0.0,))
        results = refine_lib.refine(items, model=model, config=cfg,
                                    vposer_ckpt="/nonexistent")
        assert len(results) == 2
        for _, _, out in items:
            for f in ("smplh.pkl", "conf.yaml", "pre_smplh.pkl",
                      "smplh.obj", "smplh2rgb_rend.png"):
                assert os.path.exists(os.path.join(out, f)), f
        for fit in results:
            assert np.isfinite(fit.pose).all()
            assert fit.pose.shape == (156,)
