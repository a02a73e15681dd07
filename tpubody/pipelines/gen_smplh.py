"""Fitting pipeline driver: image + OpenPose keypoints -> smplh.pkl.

Capability parity with the reference SMPLify driver
(lib/gen_smplh.py:34-191): load YAML-layered config, read the image and
keypoint JSON, run the staged fitting, dump the resolved config
(conf.yaml) and the result pickle (smplh.pkl) next to the outputs — the
same artifacts the reconstruction stage consumes
(data/tests/*/smplh.pkl schema).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from tpubody.fit import keypoints as kp_lib
from tpubody.fit import smplify
from tpubody.fit import vposer as vposer_lib
from tpubody.models import params as params_lib
from tpubody.pipelines import reconstruct as rec

DEFAULT_VPOSER_CKPT = os.environ.get(
    "TPUBODY_VPOSER_CKPT",
    "/root/reference/lib/Gen_SMPLH/vposer/snapshots/TR00_E096.pt")


def load_config(yaml_path: Optional[str] = None,
                **overrides) -> smplify.FitConfig:
    """YAML-over-defaults config layering (reference parse_config,
    lib/Gen_SMPLH/smpl_config.py:14-272 + fit_smplh.yaml)."""
    cfg = {}
    if yaml_path and os.path.exists(yaml_path):
        import yaml

        # Reference conf.yaml dumps carry !!python/tuple tags
        # (gen_smplh.py:51-53 uses yaml.dump of parsed-args objects);
        # accept them without enabling arbitrary object construction.
        class _Loader(yaml.SafeLoader):
            pass

        _Loader.add_constructor(
            "tag:yaml.org,2002:python/tuple",
            lambda loader, node: tuple(loader.construct_sequence(node)))

        with open(yaml_path) as f:
            raw = yaml.load(f, Loader=_Loader) or {}
        field_names = {f.name for f in dataclasses.fields(smplify.FitConfig)}
        rename = {
            "focal_length": "focal_length", "rho": "rho",
            "maxiters": "maxiters", "ftol": "ftol", "gtol": "gtol",
            "use_vposer": "use_vposer", "use_hands": "use_hands",
            "joints_to_ign": "joints_to_ign",
            "body_pose_prior_weights": "body_pose_prior_weights",
            "shape_weights": "shape_weights",
            "hand_pose_prior_weights": "hand_pose_prior_weights",
            "hand_joints_weights": "hand_joints_weights",
        }
        for src, dst in rename.items():
            if src in raw and dst in field_names:
                v = raw[src]
                if isinstance(v, list):
                    v = tuple(v)
                cfg[dst] = v
    cfg.update(overrides)
    return smplify.FitConfig(**cfg)


def dump_config(path: str, config: smplify.FitConfig) -> None:
    """Reproducibility: re-dump the resolved config next to the outputs
    (reference gen_smplh.py:51-53)."""
    import yaml
    with open(path, "w") as f:
        yaml.safe_dump(
            {k: (list(v) if isinstance(v, tuple) else v)
             for k, v in dataclasses.asdict(config).items()}, f)


def gen_smplh(
    img_path: str,
    keyp_path: str,
    out_path: str,
    model: Optional[params_lib.BodyModelParams] = None,
    config: Optional[smplify.FitConfig] = None,
    config_yaml: Optional[str] = None,
    vposer_ckpt: Optional[str] = None,
) -> rec.FitResult:
    """Fit SMPLH to one image's keypoints; write conf.yaml + smplh.pkl."""
    import cv2
    os.makedirs(out_path, exist_ok=True)
    config = config or load_config(config_yaml)
    dump_config(os.path.join(out_path, "conf.yaml"), config)

    img = cv2.imread(img_path)
    H, W = img.shape[:2]
    camera_center = np.array([W / 2.0, H / 2.0])

    kp = kp_lib.read_openpose_json(keyp_path, use_hands=config.use_hands)

    if model is None:
        model_path = params_lib.default_model_path("smplh")
        model = (params_lib.load(model_path) if model_path
                 else params_lib.synthetic(n_joints=52, n_verts=6890, seed=0))

    dec_params = None
    ckpt = vposer_ckpt or DEFAULT_VPOSER_CKPT
    if config.use_vposer and os.path.exists(ckpt):
        dec_params, _ = vposer_lib.load_torch_checkpoint(ckpt)

    out = smplify.fit_frame(model, kp.keypoints, camera_center, config,
                            dec_params=dec_params)

    fit = rec.FitResult(
        shape=out.shape, pose=out.pose,
        camera_center=out.camera_center,
        camera_rotation=out.camera_rotation,
        camera_translation=out.camera_translation,
        camera_fx=out.camera_fx)
    rec.save_fit_pickle(os.path.join(out_path, "smplh.pkl"), fit)
    return fit
