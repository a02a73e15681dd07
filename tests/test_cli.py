"""CLI and gen_smplh pipeline smoke tests."""
import os

import numpy as np
import pytest

from tpubody.fit import keypoints as kp_lib
from tpubody.pipelines import gen_smplh as gen_lib


def test_load_config_defaults():
    cfg = gen_lib.load_config(None)
    assert cfg.focal_length == 5000.0
    assert len(cfg.body_pose_prior_weights) == 5


def test_load_config_yaml_overrides(tmp_path):
    p = str(tmp_path / "conf.yaml")
    with open(p, "w") as f:
        f.write("focal_length: 1234\nmaxiters: 7\n"
                "shape_weights: [1, 2, 3, 4, 5]\n")
    cfg = gen_lib.load_config(p)
    assert cfg.focal_length == 1234
    assert cfg.maxiters == 7
    assert cfg.shape_weights == (1, 2, 3, 4, 5)


def test_load_config_model_type_choices(tmp_path):
    """All three smpl_config.py:83-84 model_type choices load; anything
    else must fail loudly, not silently fit something else."""
    p = str(tmp_path / "conf.yaml")
    with open(p, "w") as f:
        f.write("model_type: mano\n")
    with pytest.raises(ValueError, match="model_type"):
        gen_lib.load_config(p)
    for mt in ("smpl", "smplh", "smplx"):
        with open(p, "w") as f:
            f.write(f"model_type: {mt}\n")
        cfg = gen_lib.load_config(p)
        assert cfg.model_type == mt
        assert cfg.focal_length == 5000.0


def test_load_config_gender(tmp_path):
    """The reference --gender flag (smpl_config.py:76-80; the live fixture
    configs say male) lands on FitConfig and selects the gendered asset in
    default_model_path; bad values fail loudly."""
    from tpubody.models import params as params_lib

    assert gen_lib.load_config(None).gender == "male"
    p = str(tmp_path / "conf.yaml")
    with open(p, "w") as f:
        f.write("gender: female\n")
    assert gen_lib.load_config(p).gender == "female"
    with open(p, "w") as f:
        f.write("gender: robot\n")
    with pytest.raises(ValueError, match="gender"):
        gen_lib.load_config(p)
    with pytest.raises(ValueError, match="gender"):
        params_lib.default_model_path("smpl", gender="robot")


def test_default_model_path_gendered_assets(tmp_path, monkeypatch):
    """Resolution order: gendered asset, gendered env var, neutral asset,
    generic env var — a gendered request still resolves the neutral asset
    when no gendered one exists."""
    from tpubody.models import params as params_lib

    neutral = tmp_path / "n.npz"
    male = tmp_path / "m.npz"
    neutral.write_bytes(b"x")
    for var in ("TPUBODY_SMPL_PATH", "TPUBODY_SMPL_MALE_PATH"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("TPUBODY_SMPL_PATH", str(neutral))
    assert params_lib.default_model_path("smpl", "male") == str(neutral)
    male.write_bytes(b"x")
    monkeypatch.setenv("TPUBODY_SMPL_MALE_PATH", str(male))
    assert params_lib.default_model_path("smpl", "male") == str(male)
    assert params_lib.default_model_path("smpl", "female") == str(neutral)


def test_load_config_optim_group_flags(tmp_path):
    """optim_shape / optim_hands / flat_hand_mean (smpl_config.py:93-121)
    land on FitConfig instead of being acknowledged away."""
    p = str(tmp_path / "conf.yaml")
    with open(p, "w") as f:
        f.write("optim_shape: false\noptim_hands: false\n"
                "flat_hand_mean: true\n")
    cfg = gen_lib.load_config(p)
    assert cfg.optim_shape is False
    assert cfg.optim_hands is False
    assert cfg.flat_hand_mean is True
    dflt = gen_lib.load_config(None)
    assert dflt.optim_shape and dflt.optim_hands
    assert dflt.flat_hand_mean is False


def test_load_config_param_scales_roundtrip(tmp_path):
    """param_scales (per-group step preconditioning, fit.optim) loads from
    YAML and survives the dump_config -> load_config roundtrip."""
    p = str(tmp_path / "conf.yaml")
    with open(p, "w") as f:
        f.write("param_scales: {jaw: 8.0, expression: 2.0}\n")
    cfg = gen_lib.load_config(p)
    assert cfg.param_scales == {"jaw": 8.0, "expression": 2.0}
    out = str(tmp_path / "dumped.yaml")
    gen_lib.dump_config(out, cfg)
    assert gen_lib.load_config(out).param_scales == cfg.param_scales


def test_load_config_rejects_mismatched_schedules(tmp_path):
    """An EXPLICIT weight schedule whose length disagrees with the stage
    count must raise (reference fit_single_frame.py:110-147 asserts), not
    silently truncate."""
    p = str(tmp_path / "conf.yaml")
    with open(p, "w") as f:
        f.write("body_pose_prior_weights: [404.0, 57.4]\n"
                "data_weights: [1.0, 1.0, 1.0]\n")
    with pytest.raises(ValueError, match="data_weights"):
        gen_lib.load_config(p)
    # untouched defaults still truncate to the stage count
    cfg = gen_lib.load_config(None, body_pose_prior_weights=(404.0, 57.4))
    assert len(cfg.body_pose_prior_weights) == 2


@pytest.mark.slow
def test_gen_smplh_model_type_smpl(tmp_path):
    """The fitting pipeline runs end-to-end with model_type: smpl —
    24-joint model, BODY_25-only keypoints, (72,) pose artifacts."""
    import cv2

    from tpubody.fit import keypoints as kp_lib
    from tpubody.models import params as params_lib
    from tpubody.pipelines import reconstruct as rec

    d = tmp_path
    cv2.imwrite(str(d / "front_rgb.png"),
                np.full((64, 64, 3), 128, np.uint8))
    rng = np.random.default_rng(0)
    kp_lib.write_openpose_json(
        str(d / "0_keypoints.json"),
        np.concatenate([rng.uniform(10, 54, (25, 2)), np.ones((25, 1))], 1))
    model = params_lib.synthetic(n_joints=24, n_verts=300, seed=2)
    cfg = gen_lib.load_config(
        None, model_type="smpl", maxiters=2, focal_length=100.0,
        use_vposer=False, side_view_thsh=0.0,
        data_weights=(1.0,), body_pose_prior_weights=(404.0,),
        shape_weights=(100.0,), hand_pose_prior_weights=(404.0,),
        hand_joints_weights=(0.0,), coll_loss_weights=(0.0,))
    results = gen_lib.gen_smplh_batch(
        [(str(d / "front_rgb.png"), str(d / "0_keypoints.json"),
          str(d / "out"))],
        model=model, config=cfg, vposer_ckpt="/nonexistent")
    assert results[0].pose.shape == (72,)
    fit = rec.load_fit_pickle(str(d / "out" / "smplh.pkl"))
    assert fit.pose.shape == (72,)
    assert os.path.exists(str(d / "out" / "smplh.obj"))
    cfg2 = gen_lib.load_config(str(d / "out" / "conf.yaml"))
    assert cfg2.model_type == "smpl"


@pytest.mark.slow
def test_gen_smplh_multi_person(tmp_path):
    """A two-person OpenPose JSON fits BOTH people in one batched program
    (the reference fits only keypoints[[0]], gen_smplh.py:158): person 0
    writes the standard artifact names, person 1 the _p1-suffixed set."""
    import json

    import cv2

    from tpubody.fit import keypoints as kp_lib
    from tpubody.models import params as params_lib
    from tpubody.pipelines import reconstruct as rec

    d = tmp_path
    cv2.imwrite(str(d / "front_rgb.png"),
                np.full((64, 64, 3), 128, np.uint8))
    rng = np.random.default_rng(0)
    kp_lib.write_openpose_json(
        str(d / "0_keypoints.json"),
        np.concatenate([rng.uniform(10, 30, (25, 2)), np.ones((25, 1))], 1))
    with open(str(d / "0_keypoints.json")) as f:
        doc = json.load(f)
    second = np.concatenate(
        [rng.uniform(34, 54, (25, 2)), np.ones((25, 1))], 1)
    doc["people"].append({"pose_keypoints_2d": second.reshape(-1).tolist()})
    with open(str(d / "0_keypoints.json"), "w") as f:
        json.dump(doc, f)
    assert kp_lib.num_people(str(d / "0_keypoints.json")) == 2

    model = params_lib.synthetic(n_joints=24, n_verts=300, seed=2)
    cfg = gen_lib.load_config(
        None, model_type="smpl", maxiters=2, focal_length=100.0,
        use_vposer=False, side_view_thsh=0.0,
        data_weights=(1.0,), body_pose_prior_weights=(404.0,),
        shape_weights=(100.0,), hand_pose_prior_weights=(404.0,),
        hand_joints_weights=(0.0,), coll_loss_weights=(0.0,))
    fit0 = gen_lib.gen_smplh(
        str(d / "front_rgb.png"), str(d / "0_keypoints.json"),
        str(d / "out"), model=model, config=cfg,
        vposer_ckpt="/nonexistent")
    assert fit0.pose.shape == (72,)
    fit1 = rec.load_fit_pickle(str(d / "out" / "smplh_p1.pkl"))
    assert fit1.pose.shape == (72,)
    # Different keypoint clusters -> different solutions.
    assert not np.allclose(fit0.pose, fit1.pose)
    for name in ("smplh.pkl", "smplh.obj", "pre_smplh.pkl",
                 "smplh_p1.obj", "pre_smplh_p1.pkl",
                 "smplh2rgb_rend_p1.png"):
        assert os.path.exists(str(d / "out" / name)), name
    # max_persons: 1 falls back to the single-person path (person 0 only).
    import dataclasses
    cfg1 = dataclasses.replace(cfg, max_persons=1)
    gen_lib.gen_smplh(
        str(d / "front_rgb.png"), str(d / "0_keypoints.json"),
        str(d / "out1"), model=model, config=cfg1,
        vposer_ckpt="/nonexistent")
    assert os.path.exists(str(d / "out1" / "smplh.pkl"))
    assert not os.path.exists(str(d / "out1" / "smplh_p1.pkl"))

    # The batch driver flattens (dir, person) rows into one program; with
    # the SAME model/config objects it reuses the already-compiled N=2
    # fitter from the call above.
    fits = gen_lib.gen_smplh_batch(
        [(str(d / "front_rgb.png"), str(d / "0_keypoints.json"),
          str(d / "outb"))],
        model=model, config=cfg, vposer_ckpt="/nonexistent")
    assert len(fits) == 1  # person-0 results, input order
    np.testing.assert_allclose(fits[0].pose, fit0.pose, atol=1e-5)
    for name in ("smplh.pkl", "smplh_p1.pkl", "smplh_p1.obj"):
        assert os.path.exists(str(d / "outb" / name)), name


@pytest.mark.slow
def test_gen_smplh_model_type_smplx(tmp_path):
    """The fitting pipeline runs end-to-end with model_type: smplx —
    55-joint humanoid, face keypoints consumed, (165,) pose artifacts,
    jaw/eye/hand/expression entries in pre_smplh.pkl."""
    import pickle

    import cv2

    from tpubody.fit import keypoints as kp_lib
    from tpubody.models import humanoid as humanoid_lib
    from tpubody.pipelines import reconstruct as rec

    d = tmp_path
    cv2.imwrite(str(d / "front_rgb.png"),
                np.full((64, 64, 3), 128, np.uint8))
    rng = np.random.default_rng(0)
    # Full OpenPose JSON with hands + face (25 + 2x21 + 70 rows).
    body = np.concatenate(
        [rng.uniform(10, 54, (25, 2)), np.ones((25, 1))], 1)
    hands = [np.concatenate(
        [rng.uniform(10, 54, (21, 2)), np.ones((21, 1))], 1)
        for _ in range(2)]
    kp_lib.write_openpose_json(str(d / "0_keypoints.json"), body,
                               left_hand=hands[0], right_hand=hands[1])
    import json
    with open(str(d / "0_keypoints.json")) as f:
        doc = json.load(f)
    face = np.concatenate(
        [rng.uniform(10, 54, (70, 2)), np.ones((70, 1))], 1)
    doc["people"][0]["face_keypoints_2d"] = face.reshape(-1).tolist()
    with open(str(d / "0_keypoints.json"), "w") as f:
        json.dump(doc, f)

    model = humanoid_lib.humanoid(n_joints=55, n_verts=1600)
    cfg = gen_lib.load_config(
        None, model_type="smplx", use_face=True, maxiters=2,
        focal_length=100.0, use_vposer=False, side_view_thsh=0.0,
        data_weights=(1.0,), body_pose_prior_weights=(404.0,),
        shape_weights=(100.0,), hand_pose_prior_weights=(404.0,),
        hand_joints_weights=(0.0,), coll_loss_weights=(0.0,),
        expr_weights=(100.0,), face_joints_weights=(0.5,),
        jaw_pose_prior_weights=((404.0, 404.0, 404.0),))
    results = gen_lib.gen_smplh_batch(
        [(str(d / "front_rgb.png"), str(d / "0_keypoints.json"),
          str(d / "out"))],
        model=model, config=cfg, vposer_ckpt="/nonexistent")
    assert results[0].pose.shape == (165,)
    fit = rec.load_fit_pickle(str(d / "out" / "smplh.pkl"))
    assert fit.pose.shape == (165,)
    with open(str(d / "out" / "pre_smplh.pkl"), "rb") as f:
        pre = pickle.load(f)
    assert pre["jaw_pose"].shape == (3,)
    assert pre["expression"].shape == (10,)
    assert pre["left_hand_pose"].shape == (45,)
    assert os.path.exists(str(d / "out" / "smplh.obj"))
    assert os.path.exists(str(d / "out" / "smplh2rgb_rend.png"))
    cfg2 = gen_lib.load_config(str(d / "out" / "conf.yaml"))
    assert cfg2.model_type == "smplx" and cfg2.use_face


def test_dump_config_roundtrip(tmp_path):
    cfg = gen_lib.load_config(None, maxiters=11)
    p = str(tmp_path / "conf.yaml")
    gen_lib.dump_config(p, cfg)
    cfg2 = gen_lib.load_config(p)
    assert cfg2.maxiters == 11


@pytest.mark.slow
def test_gen_smplh_end_to_end(tmp_path):
    """Tiny synthetic fit through the public pipeline entry."""
    import cv2
    from tpubody.models import params as params_lib

    img_path = str(tmp_path / "img.png")
    cv2.imwrite(img_path, np.zeros((100, 100, 3), np.uint8))
    kp_path = str(tmp_path / "kp.json")
    rng = np.random.default_rng(0)
    body = np.concatenate(
        [rng.uniform(20, 80, (25, 2)), np.ones((25, 1))], axis=1)
    kp_lib.write_openpose_json(kp_path, body,
                               np.zeros((21, 3)), np.zeros((21, 3)))

    model = params_lib.synthetic(n_joints=52, n_verts=500, seed=2)
    cfg = gen_lib.load_config(None, maxiters=5, focal_length=500.0,
                              use_vposer=True)
    out = gen_lib.gen_smplh(img_path, kp_path, str(tmp_path / "out"),
                            model=model, config=cfg, vposer_ckpt="/nonexistent")
    assert out.pose.shape == (156,)
    assert os.path.exists(tmp_path / "out" / "smplh.pkl")
    assert os.path.exists(tmp_path / "out" / "conf.yaml")
    # The pickle loads back through the reconstruction-side reader.
    from tpubody.pipelines import reconstruct as rec
    fit = rec.load_fit_pickle(str(tmp_path / "out" / "smplh.pkl"))
    assert np.isfinite(fit.pose).all()


@pytest.mark.slow
def test_gen_smplh_batch_two_dirs(tmp_path):
    """gen_smplh_batch fits two fixture-layout dirs through one vmapped
    program and writes the full artifact set in each."""
    import cv2
    from tpubody.models import params as params_lib

    rng = np.random.default_rng(1)
    items = []
    for i in range(2):
        d = tmp_path / f"case{i}"
        d.mkdir()
        cv2.imwrite(str(d / "front_rgb.png"),
                    np.zeros((100, 100, 3), np.uint8))
        body = np.concatenate(
            [rng.uniform(20, 80, (25, 2)), np.ones((25, 1))], axis=1)
        kp_lib.write_openpose_json(str(d / "0_keypoints.json"), body,
                                   np.zeros((21, 3)), np.zeros((21, 3)))
        items.append((str(d / "front_rgb.png"),
                      str(d / "0_keypoints.json"), str(d / "out")))

    model = params_lib.synthetic(n_joints=52, n_verts=300, seed=2)
    cfg = gen_lib.load_config(
        None, maxiters=3, focal_length=500.0, use_vposer=True,
        data_weights=(1.0, 1.0), body_pose_prior_weights=(404.0, 57.4),
        shape_weights=(100.0, 10.0), hand_pose_prior_weights=(404.0, 57.4),
        hand_joints_weights=(0.0, 0.1), coll_loss_weights=(0.0, 0.0))
    results = gen_lib.gen_smplh_batch(items, model=model, config=cfg,
                                      vposer_ckpt="/nonexistent")
    assert len(results) == 2
    for _, _, out in items:
        assert os.path.exists(os.path.join(out, "smplh.pkl"))
        assert os.path.exists(os.path.join(out, "conf.yaml"))
        assert os.path.exists(os.path.join(out, "pre_smplh.pkl"))
        assert os.path.exists(os.path.join(out, "smplh.obj"))
        assert os.path.exists(os.path.join(out, "smplh2rgb_rend.png"))
    for fit in results:
        assert np.isfinite(fit.pose).all()
        assert fit.pose.shape == (156,)


def test_cli_detect_pose(tmp_path):
    """detect-pose writes OpenPose-format JSON that the fitting stack
    reads (lib/openpose.py contract)."""
    import cv2
    import numpy as np
    from tpubody import cli
    from tpubody.fit import keypoints as kp_lib
    img = (np.random.default_rng(0).uniform(0, 255, (96, 80, 3))
           .astype(np.uint8))
    p_img = str(tmp_path / "person.png")
    cv2.imwrite(p_img, img)
    p_out = str(tmp_path / "0_keypoints.json")
    assert cli.main(["detect-pose", p_img, p_out, "--size", "64"]) == 0
    kp = kp_lib.read_openpose_json(p_out)
    assert kp.keypoints.shape == (67, 3)
    assert np.isfinite(kp.keypoints).all()


@pytest.mark.slow
def test_cli_train_then_detect_pose(tmp_path):
    """The advertised train-pose2d -> detect-pose --ckpt flow round-trips:
    the checkpoint carries its architecture (24 synthetic joints) and
    detect-pose rebuilds it instead of the 67-slot default."""
    import cv2
    import numpy as np
    from tpubody import cli
    from tpubody.fit import keypoints as kp_lib
    ckpt = str(tmp_path / "pose_ckpt")
    assert cli.main([
        "train-pose2d", "--out", ckpt, "--steps", "2", "--batch", "2",
        "--size", "48", "--features", "8", "--domain-rand"]) == 0
    img = (np.random.default_rng(0).uniform(0, 255, (96, 80, 3))
           .astype(np.uint8))
    p_img = str(tmp_path / "person.png")
    cv2.imwrite(p_img, img)
    p_out = str(tmp_path / "0_keypoints.json")
    assert cli.main(["detect-pose", p_img, p_out, "--size", "48",
                     "--ckpt", ckpt]) == 0
    kp = kp_lib.read_openpose_json(p_out)
    assert kp.keypoints.shape == (67, 3)
    assert np.isfinite(kp.keypoints).all()
    # the padded tail (no model output) is confidence-0
    assert (kp.keypoints[25:, 2] == 0).all()


@pytest.mark.slow
def test_cli_train_hmr_synthetic(tmp_path):
    """train-hmr runs end to end on synthetic data and saves a restorable
    checkpoint."""
    from tpubody import cli
    out = str(tmp_path / "ckpt")
    assert cli.main([
        "train-hmr", "--synthetic", "8", "--out", out,
        "--steps", "2", "--batch", "4", "--size", "32",
        "--verts", "64"]) == 0
    import jax.numpy as jnp
    import optax
    from tpubody.models import hmr as hmr_lib
    from tpubody.models import hmr_train
    from tpubody.utils import checkpoint as ckpt_lib
    model = hmr_lib.HMR(mean_params=hmr_lib.default_mean_params(),
                        n_iter=3, dtype=jnp.float32)
    template = hmr_train.create_train_state(
        model, optax.adam(1e-4), image_size=32)
    restored = ckpt_lib.restore_train_state(out, template)
    assert int(restored.step) == 2


@pytest.mark.slow
def test_cli_infer(tmp_path):
    """infer writes one mesh per image + params.npz (flagship path)."""
    import cv2
    import numpy as np
    from tpubody import cli
    rng = np.random.default_rng(1)
    imgs = []
    for i in range(2):
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, rng.integers(0, 255, (64, 48, 3), dtype=np.uint8))
        imgs.append(p)
    out = str(tmp_path / "meshes")
    assert cli.main(["infer", *imgs, "--out", out]) == 0
    import os
    assert sorted(os.listdir(out)) == ["img0.obj", "img1.obj", "params.npz"]
    z = np.load(os.path.join(out, "params.npz"))
    assert z["rotmats"].shape == (2, 24, 3, 3)


@pytest.mark.slow
def test_cli_fit_video_smpl_model_type(tmp_path):
    """fit-video honors model_type: smpl — 24-joint model from config,
    BODY_25-only keypoints, (T,72) poses, direct SMPL-24 clip export."""
    import jax.numpy as jnp
    from tpubody.fit import joints as joints_lib
    from tpubody.fit import smplify
    from tpubody.io import motion as motion_lib
    from tpubody.models import params as params_lib
    from tpubody.models import smpl as smpl_lib

    model = params_lib.load_or_synthetic("smpl", n_joints=24, n_verts=600,
                                         warn=False)
    state = smpl_lib.forward(model, jnp.zeros((24, 3)), jnp.zeros(10))
    j3 = joints_lib.openpose_joints(state.verts, state.joints_posed)
    proj = np.asarray(smplify._project(
        j3, jnp.asarray([0.0, 0.0, 6.0]), 800.0,
        jnp.asarray([128.0, 128.0])))
    kp_lib.write_openpose_json(
        str(tmp_path / "000_keypoints.json"),
        np.concatenate([proj, np.ones((25, 1))], axis=1))

    conf = tmp_path / "conf.yaml"
    conf.write_text(
        "model_type: smpl\nfocal_length: 800\nmaxiters: 3\n"
        "use_vposer: false\nside_view_thsh: 0\n"
        "data_weights: [1.0]\nbody_pose_prior_weights: [404.0]\n"
        "shape_weights: [100.0]\nhand_pose_prior_weights: [404.0]\n"
        "hand_joints_weights: [0.0]\ncoll_loss_weights: [0.0]\n")
    out_npz = str(tmp_path / "fits.npz")
    clip = str(tmp_path / "result.pkl")
    from tpubody import cli
    rc = cli.main([
        "fit-video", str(tmp_path / "*_keypoints.json"), out_npz,
        "--config", str(conf), "--cx", "128", "--cy", "128",
        "--clip-out", clip, "--verts", "600"])
    assert rc == 0
    z = np.load(out_npz)
    assert z["pose"].shape == (1, 72)
    mc = motion_lib.read_mixamo(clip)
    assert mc.poses.shape == (1, 24, 3)
    # joints 22/23 come straight from the 72-dim fit (not zeroed)
    np.testing.assert_allclose(mc.poses.reshape(72), z["pose"][0])


@pytest.mark.slow
def test_cli_fit_video_chain_to_animate(tmp_path):
    """photos-of-motion workflow end to end: keypoint JSONs -> fit-video
    (chained) -> result.pkl -> readable as an animate clip."""
    import jax.numpy as jnp
    from tpubody.fit import joints as joints_lib
    from tpubody.fit import smplify
    from tpubody.io import motion as motion_lib
    from tpubody.models import params as params_lib
    from tpubody.models import smpl as smpl_lib

    model = params_lib.synthetic(n_joints=52, n_verts=400, seed=0)
    state = smpl_lib.forward(model, jnp.zeros((52, 3)), jnp.zeros(10))
    j3 = joints_lib.openpose_joints(state.verts, state.joints_posed)
    for t, tx in enumerate((-0.1, 0.1)):
        proj = np.asarray(smplify._project(
            j3, jnp.asarray([tx, 0.0, 4.0]), 800.0,
            jnp.asarray([128.0, 128.0])))
        kp_lib.write_openpose_json(
            str(tmp_path / f"{t:03d}_keypoints.json"),
            np.concatenate([proj, np.ones((67, 1))], axis=1))

    conf = tmp_path / "conf.yaml"
    conf.write_text(
        "focal_length: 800\nmaxiters: 4\nside_view_thsh: 0\n"
        "data_weights: [1.0]\nbody_pose_prior_weights: [404.0]\n"
        "shape_weights: [100.0]\nhand_pose_prior_weights: [404.0]\n"
        "hand_joints_weights: [0.0]\ncoll_loss_weights: [0.0]\n")
    out_npz = str(tmp_path / "fits.npz")
    clip = str(tmp_path / "result.pkl")
    from tpubody import cli
    rc = cli.main([
        "fit-video", str(tmp_path / "*_keypoints.json"), out_npz,
        "--config", str(conf), "--temporal-weight", "50.0",
        "--cx", "128", "--cy", "128", "--clip-out", clip, "--verts", "400"])
    assert rc == 0
    z = np.load(out_npz)
    assert z["pose"].shape == (2, 156)
    assert np.isfinite(z["loss"]).all()
    mc = motion_lib.read_mixamo(clip)
    assert mc.poses.shape == (2, 24, 3)
