"""Parity smoke tests against the reference's golden fixture directories
(data/tests/test01..test03_1024 — SURVEY.md §4).

The real SMPL/SMPLH parameter pickles are stripped from the reference
checkout, so these tests use synthetic body models; what they verify is
the *interface parity*: the fixture files parse, the camera/pose formats
drive our pipeline, and the full reconstruction runs on the real 1024^2
photo/mask inputs (downscaled for CPU test budget).
"""
import os

import numpy as np
import pytest

FIXTURE = "/root/reference/data/tests/test01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE), reason="reference fixtures unavailable")


class TestFixtureIO:
    def test_smplh_pkl_schema(self):
        from tpubody.pipelines import reconstruct as rec
        fit = rec.load_fit_pickle(os.path.join(FIXTURE, "smplh.pkl"))
        assert fit.pose.shape == (156,)
        assert fit.shape.shape == (10,)
        assert fit.camera_rotation.shape == (3, 3)
        assert fit.camera_fx == 5000.0
        assert np.isfinite(fit.pose).all()

    def test_keypoints_json(self):
        from tpubody.fit import keypoints as kp_lib
        kp = kp_lib.read_openpose_json(
            os.path.join(FIXTURE, "0_keypoints.json"))
        assert kp.keypoints.shape == (67, 3)
        # Keypoints lie inside the 1024^2 frame.
        valid = kp.keypoints[:, 2] > 0.1
        assert (kp.keypoints[valid, :2] >= 0).all()
        assert (kp.keypoints[valid, :2] < 1024).all()

    def test_images_load(self):
        from tpubody.pipelines import reconstruct as rec
        front, back, mask, fit = rec.load_test_dir(FIXTURE)
        assert front.shape == (1024, 1024, 3)
        assert mask.shape == (1024, 1024)
        assert (mask > 0).mean() > 0.02     # person silhouette present

    def test_conf_yaml_loads(self):
        from tpubody.pipelines import gen_smplh as gen_lib
        cfg = gen_lib.load_config(os.path.join(FIXTURE, "conf.yaml"))
        assert cfg.focal_length == 5000.0
        assert len(cfg.body_pose_prior_weights) == 5

    def test_conf_yaml_full_flag_parity(self):
        """Every live fitting flag in the reference fixture conf.yaml
        lands on its FitConfig field — no silent drops (VERDICT round 1;
        reference smpl_config.py:14-272 is the source surface)."""
        from tpubody.pipelines import gen_smplh as gen_lib
        cfg = gen_lib.load_config(os.path.join(FIXTURE, "conf.yaml"))
        assert cfg.optim_type == "lbfgsls"
        assert cfg.lr == 1.0
        assert cfg.maxiters == 30
        assert cfg.ftol == 1e-9 and cfg.gtol == 1e-9
        assert cfg.rho == 100.0
        assert cfg.depth_loss_weight == 100.0
        assert tuple(cfg.data_weights) == (1, 1, 1, 1, 1)
        assert tuple(cfg.body_pose_prior_weights) == (
            404.0, 404.0, 57.4, 4.78, 4.78)
        assert tuple(cfg.shape_weights) == (100.0, 50.0, 10.0, 5.0, 5.0)
        assert tuple(cfg.hand_pose_prior_weights) == (
            404.0, 404.0, 57.4, 4.78, 4.78)
        assert tuple(cfg.hand_joints_weights) == (0.0, 0.0, 0.0, 0.1, 2.0)
        assert tuple(cfg.coll_loss_weights) == (0.0, 0.0, 0.0, 0.01, 1.0)
        assert cfg.use_vposer and cfg.use_hands and cfg.use_joints_conf
        assert cfg.use_pca and cfg.num_pca_comps == 12
        assert not cfg.interpenetration
        assert cfg.body_prior_type == "l2"
        assert cfg.num_gaussians == 8
        assert cfg.prior_folder == "priors"
        assert cfg.side_view_thsh == 25
        assert tuple(cfg.joints_to_ign) == (1, 9, 12)
        assert tuple(cfg.init_joints_idxs) == (9, 12, 2, 5)
        assert cfg.body_tri_idxs == ((5, 12), (2, 9))

    def test_conf_yaml_unknown_key_raises(self, tmp_path):
        from tpubody.pipelines import gen_smplh as gen_lib
        p = tmp_path / "conf.yaml"
        p.write_text("optim_type: adam\nsome_new_flag: 3\n")
        with pytest.raises(ValueError, match="some_new_flag"):
            gen_lib.load_config(str(p))

    def test_conf_yaml_flat_tri_idxs_and_scalar_ign(self, tmp_path):
        """smpl_config.py CLI forms: flat body_tri_idxs [5,12,2,9] and
        scalar joints_to_ign -1."""
        from tpubody.pipelines import gen_smplh as gen_lib
        p = tmp_path / "conf.yaml"
        p.write_text("body_tri_idxs: [5, 12, 2, 9]\njoints_to_ign: -1\n")
        cfg = gen_lib.load_config(str(p))
        assert cfg.body_tri_idxs == ((5, 12), (2, 9))
        assert cfg.joints_to_ign == ()


@pytest.mark.slow
class TestFixtureReconstruct:
    def test_full_pipeline_on_real_fixture(self, tmp_path):
        """End-to-end reconstruction on the real photo/mask (downscaled to
        256^2), synthetic body models standing in for the stripped pkls."""
        import cv2
        import jax.numpy as jnp
        from tests.test_reconstruct_e2e import _sphere_body
        from tpubody.pipelines import reconstruct as rec

        front, back, mask, fit = rec.load_test_dir(FIXTURE)
        S = 256
        front_s = cv2.resize(front, (S, S))
        back_s = cv2.resize(back, (S, S))
        mask_s = cv2.resize(mask, (S, S), interpolation=cv2.INTER_NEAREST)
        # Keep only the largest component nonzero values binary.
        mask_s = (mask_s > 127).astype(np.uint8) * 255

        scale = S / 1024.0
        fit_s = rec.FitResult(
            shape=fit.shape, pose=fit.pose,
            camera_center=fit.camera_center * scale,
            camera_rotation=fit.camera_rotation,
            camera_translation=fit.camera_translation,
            camera_fx=fit.camera_fx * scale)

        smplh = _sphere_body(52)
        smpl = _sphere_body(24)
        out = rec.reconstruct(front_s, back_s, mask_s, fit_s, smplh, smpl,
                              out_dir=str(tmp_path), cache=False)
        assert np.isfinite(out.avatar.v_template).all()
        assert out.points.shape[1] == 30
        assert (tmp_path / "out.ply").exists()


class TestAllFixtureConfigs:
    def test_every_fixture_conf_yaml_loads_fully(self):
        """All three golden fixture configs round-trip through load_config
        with zero silently-dropped keys (it raises on unknowns)."""
        from tpubody.pipelines import gen_smplh as gen_lib
        for d in ("test01", "test02", "test03_1024"):
            p = f"/root/reference/data/tests/{d}/conf.yaml"
            if not os.path.exists(p):
                continue
            cfg = gen_lib.load_config(p)
            assert cfg.focal_length > 0
            assert len(cfg.body_pose_prior_weights) >= 1, d


class TestMotionFixtures:
    """The real motion-clip fixtures parse with the reference's formats
    (read_amsass lib/model2video.py:527-531; read_mixamo
    lib/model2video_miaxmo.py:544-550)."""

    def test_real_amass_clips_parse(self):
        import glob

        from tpubody.io import motion as motion_lib
        clips = sorted(glob.glob("/root/reference/data/amsass/*.npz"))
        if not clips:
            pytest.skip("no AMASS fixtures present")
        for p in clips:
            clip = motion_lib.read_amass(p)
            assert clip.poses.ndim == 3 and clip.poses.shape[1:] == (24, 3)
            assert clip.trans.shape == (clip.poses.shape[0], 3)
            assert np.isfinite(clip.poses).all()
            # root translation is re-based to the first frame (:531)
            np.testing.assert_allclose(clip.trans[0], 0.0, atol=1e-9)

    def test_real_mixamo_clips_parse(self):
        import glob

        from tpubody.io import motion as motion_lib
        pkls = sorted(glob.glob("/root/reference/data/mixamo/*/result.pkl"))
        if not pkls:
            pytest.skip("no mixamo fixtures present")
        for p in pkls[:4]:
            clip = motion_lib.read_mixamo(p)
            assert clip.poses.shape[1:] == (24, 3)
            assert np.isfinite(clip.poses).all()
            assert clip.fps > 0


def test_expected_intermediates_schema():
    """test02 carries expected J_3d.npy (24, 3) — schema check (numeric
    parity needs the stripped real body models)."""
    p = "/root/reference/data/tests/test02/J_3d.npy"
    if not os.path.exists(p):
        pytest.skip("no J_3d.npy in fixture")
    j = np.load(p)
    assert j.shape == (24, 3)
    assert np.isfinite(j).all()


@pytest.mark.slow
class TestFixtureFit:
    def test_fitting_reduces_reprojection_on_real_keypoints(self):
        """SMPLify on test01's REAL OpenPose keypoints (synthetic body
        standing in for the stripped SMPLH pkl): the staged fit must cut
        the weighted 2D reprojection error well below the zero-pose
        initialization."""
        import jax.numpy as jnp
        from tpubody.fit import joints as joints_lib
        from tpubody.fit import keypoints as kp_lib
        from tpubody.fit import smplify
        from tpubody.models import params as params_lib
        from tpubody.models import smpl as smpl_lib
        from tpubody.core.rotations import rodrigues

        kp = kp_lib.read_openpose_json(
            os.path.join(FIXTURE, "0_keypoints.json"))
        model = params_lib.synthetic(n_joints=52, n_verts=400, seed=0)
        center = np.array([512.0, 512.0])
        cfg = smplify.FitConfig(maxiters=10)

        def reproj_err(pose156, cam_t):
            R = rodrigues(jnp.asarray(pose156, jnp.float32).reshape(52, 3))
            state = smpl_lib.forward(model, R, jnp.zeros(10),
                                     pose_is_rotmat=True)
            j = joints_lib.openpose_joints(
                state.verts, state.joints_posed,
                vertex_ids=joints_lib.extra_vertex_ids(model.num_verts))
            cam = j + jnp.asarray(cam_t, jnp.float32)
            z = jnp.maximum(cam[..., 2:3], 1e-2)
            proj = cam[..., :2] / z * cfg.focal_length + center
            conf = kp.keypoints[:, 2]
            d = np.linalg.norm(np.asarray(proj) - kp.keypoints[:, :2],
                               axis=-1)
            return float((d * conf).sum() / conf.sum())

        out = smplify.fit_frame(model, kp.keypoints, center, cfg)
        # initial error: zero pose at the fitted camera depth
        err0 = reproj_err(np.zeros(156), out.camera_translation)
        err1 = reproj_err(out.pose, out.camera_translation)
        assert np.isfinite(out.loss)
        assert err1 < err0 * 0.9, (err0, err1)


@pytest.mark.slow
class TestFitArtifacts:
    def test_gen_smplh_writes_reference_artifacts(self, tmp_path):
        """gen_smplh emits the reference's side-artifacts next to
        smplh.pkl: pre_smplh.pkl, smplh.obj, smplh2rgb_rend.png
        (fit_single_frame.py:440-521)."""
        import pickle

        from tpubody.fit import smplify
        from tpubody.mesh import meshio
        from tpubody.models import params as params_lib
        from tpubody.pipelines import gen_smplh as gen_lib

        model = params_lib.synthetic(n_joints=52, n_verts=300, seed=0)
        cfg = smplify.FitConfig(maxiters=2, optim_type="adam", lr=0.05,
                                side_view_thsh=0.0)
        out_dir = str(tmp_path)
        gen_lib.gen_smplh(
            os.path.join(FIXTURE, "front_rgb.png"),
            os.path.join(FIXTURE, "0_keypoints.json"),
            out_dir, model=model, config=cfg)

        for name in ("conf.yaml", "smplh.pkl", "pre_smplh.pkl",
                     "smplh.obj", "smplh2rgb_rend.png"):
            assert os.path.exists(os.path.join(out_dir, name)), name

        with open(os.path.join(out_dir, "pre_smplh.pkl"), "rb") as f:
            pre = pickle.load(f)
        assert pre["camera_translation"].shape == (3,)
        assert pre["betas"].shape == (10,)
        assert pre["body_pose"].shape in ((32,), (63,))

        verts, faces = meshio.read_obj(os.path.join(out_dir, "smplh.obj"))
        assert verts.shape == (300, 3) and faces.shape[1] == 3

        import cv2
        overlay = cv2.imread(os.path.join(out_dir, "smplh2rgb_rend.png"))
        photo = cv2.imread(os.path.join(FIXTURE, "front_rgb.png"))
        assert overlay.shape == photo.shape
        # The render changed a non-trivial number of pixels.
        changed = (np.abs(overlay.astype(int) - photo.astype(int)).sum(-1)
                   > 10).mean()
        assert changed > 1e-4, changed
