"""SPIN-style regress-then-optimize: HMR warm-starts SMPLify.

Beyond the reference (which always fits from zero, fit_single_frame.py:
210-268): the HMR regressor predicts (pose rotmats, shape, weak-persp
camera) from the image crop in one forward pass, those predictions are
converted into the fitting parameterization — full-image perspective
camera translation (render.camera.crop_cam_to_orig), axis-angle body
pose, optionally a VPoser latent via the encoder — and the staged
SMPLify refines from there instead of from zero.  A good warm start both
cuts optimizer iterations and avoids the 180° orientation ambiguity.

Batched end to end: N images -> one HMR forward -> one vmapped
fit_frames program.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from tpubody.core.rotations import rotmat_to_axis_angle
from tpubody.fit import keypoints as kp_lib
from tpubody.fit import smplify
from tpubody.fit import vposer as vposer_lib
from tpubody.models import params as params_lib
from tpubody.render import camera as camera_lib


def keypoint_crop_params(keypoints: np.ndarray, pad: float = 1.2):
    """(67, 3) keypoints -> (center (2,), HMR scale) of the person bbox
    (the standard keypoint-driven crop; scale is side/200 like
    utils/image.py scale_and_crop)."""
    kp = np.asarray(keypoints)
    valid = kp[:, 2] > 0
    pts = kp[valid, :2] if valid.any() else kp[:, :2]
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    center = (lo + hi) / 2.0
    side = max(float((hi - lo).max()), 1.0) * pad
    return center, side / 200.0


def hmr_init_from_images(
    predictor,
    img_paths: Sequence[str],
    keypoints: np.ndarray,          # (N, 67, 3)
    img_centers: np.ndarray,        # (N, 2) principal points (W/2, H/2)
    config: smplify.FitConfig,
    enc_params=None,
):
    """Run HMR on keypoint-centered crops and convert its predictions into
    fit_frames inits: (init_cam_t (N,3), init_params dict)."""
    centers, scales = [], []
    for i in range(len(img_paths)):
        c, s = keypoint_crop_params(keypoints[i])
        centers.append(c)
        scales.append(s)
    centers = np.asarray(centers, np.float32)
    scales = np.asarray(scales, np.float32)

    pred = predictor.from_files(img_paths, centers=centers, scales=scales)

    init_cam_t = np.asarray(camera_lib.crop_cam_to_orig(
        pred.cam, centers, scales, config.focal_length, img_centers))

    # HMR predicts SMPL rotmats: joint 0 = global orient, 1..21 = the
    # shared body chain, 22/23 = SMPL's wrist-level hands.  The SMPLH fit
    # seeds its 63-dim body pose from 1..21 (hands are fitted separately);
    # a model_type='smpl' fit takes the full 69-dim 1..23 seed.
    aa = np.asarray(rotmat_to_axis_angle(jnp.asarray(pred.rotmats)))
    init_params = {
        "global_orient": aa[:, 0],
        "betas": np.asarray(pred.shape, np.float32),
    }
    body63 = aa[:, 1:22].reshape(len(img_paths), 63).astype(np.float32)
    if config.use_vposer:
        if enc_params is not None:
            enc = vposer_lib.VPoserEncoder()
            mu, _ = enc.apply(enc_params, jnp.asarray(body63))
            init_params["pose_embedding"] = np.asarray(mu, np.float32)
        # else: keep the zero embedding — a random-init encoder would be
        # a worse start than the VPoser prior mean.
    elif config.model_type == "smpl":
        init_params["body_pose"] = aa[:, 1:24].reshape(
            len(img_paths), 69).astype(np.float32)
    else:
        init_params["body_pose"] = body63
    return init_cam_t, init_params


def refine(
    items,                           # [(img, keyp, out_dir), ...]
    model: Optional[params_lib.BodyModelParams] = None,
    config: Optional[smplify.FitConfig] = None,
    config_yaml: Optional[str] = None,
    vposer_ckpt: Optional[str] = None,
    predictor=None,
    hmr_ckpt: Optional[str] = None,
    save_artifacts: bool = True,
    mesh=None,
):
    """images + keypoints -> HMR warm start -> batched SMPLify -> the full
    per-dir artifact set (conf.yaml, smplh.pkl, pre_smplh.pkl, smplh.obj,
    overlay PNG).  Returns FitResults in input order."""
    import cv2

    from tpubody.pipelines import gen_smplh as gen_lib
    from tpubody.pipelines import hmr_infer
    from tpubody.pipelines import reconstruct as rec

    config = config or gen_lib.load_config(config_yaml)
    if model is None:
        model = gen_lib.default_fit_model(config)
    gen_lib.check_model_family(model, config)
    if predictor is None:
        predictor = hmr_infer.HMRPredictor(
            focal_length=config.focal_length)
        if hmr_ckpt:
            predictor.load_torch_checkpoint(hmr_ckpt)

    dec_params, enc_params = None, None
    ckpt = vposer_ckpt or gen_lib.DEFAULT_VPOSER_CKPT
    if config.use_vposer and os.path.exists(ckpt):
        dec_params, enc_params = vposer_lib.load_torch_checkpoint(ckpt)

    imgs, kps, img_centers = [], [], []
    for img_path, keyp_path, _ in items:
        img = cv2.imread(img_path)
        if img is None:
            raise FileNotFoundError(f"unreadable image: {img_path}")
        H, W = img.shape[:2]
        imgs.append(img)
        img_centers.append([W / 2.0, H / 2.0])
        kps.append(kp_lib.read_openpose_json(
            keyp_path, use_hands=gen_lib._hands(config),
            use_face=gen_lib._face(config),
            use_face_contour=config.use_face_contour).keypoints)
    kps = np.stack(kps).astype(np.float32)
    img_centers = np.asarray(img_centers, np.float32)

    init_cam_t, init_params = hmr_init_from_images(
        predictor, [it[0] for it in items], kps, img_centers, config,
        enc_params=enc_params)

    batch = smplify.fit_frames(
        model, kps, img_centers, config, dec_params=dec_params,
        init_cam_t=init_cam_t, init_params=init_params, mesh=mesh)

    return gen_lib.save_batch_fit_results(items, batch, imgs, model, config,
                                          save_artifacts=save_artifacts)
