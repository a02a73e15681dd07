"""Real-photo PCK for the in-framework pose2d detector.

The reference's pipeline entry is pyopenpose on real photos
(lib/openpose.py:19-41); tpubody's experimental detector
(models/pose2d.py) has so far only synthetic-render evidence.  This tool
produces a REAL-photo number using the reference test fixtures, which
carry real photographs alongside real OpenPose output
(data/tests/test01/0_keypoints.json) as weak ground truth.

The detector emits keypoints in SMPL skeleton order (the synthetic
trainer's label space); those are mapped onto OpenPose BODY_25 slots via
the fitting permutation tables (fit/keypoints.py) — skeleton-backed slots
only (neck/shoulders/elbows/wrists/hips/knees/ankles; nose/eye/ear/foot
surface extras have no skeleton counterpart).  PCK@t counts predictions
within t * max(GT bbox side) of OpenPose, over GT conf > conf_min.

Usage: python tools/eval_pose2d.py --ckpt CKPT [--fixtures DIR ...]
Prints ONE JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import _cache  # noqa: E402

_cache.enable()

import numpy as np

DEFAULT_FIXTURES = (
    "/root/reference/data/tests/test01",
    "/root/reference/data/tests/test02",
)

# BODY_25 slot -> SMPL skeleton joint (fit/keypoints.py SMPL_BODY_TO_OPENPOSE
# restricted to real skeleton joints, i.e. index < 24; slot 8 (midhip) is
# SMPL joint 0 = pelvis).
_BODY25_FROM_SMPL = {1: 12, 2: 17, 3: 19, 4: 21, 5: 16, 6: 18, 7: 20,
                     8: 0, 9: 2, 10: 5, 11: 8, 12: 1, 13: 4, 14: 7}
_SLOT_NAMES = {1: "neck", 2: "rsho", 3: "relb", 4: "rwri", 5: "lsho",
               6: "lelb", 7: "lwri", 8: "midhip", 9: "rhip", 10: "rkne",
               11: "rank", 12: "lhip", 13: "lkne", 14: "lank"}


def detect_on_image(img: np.ndarray, ckpt: str, size: int) -> np.ndarray:
    """Run the detector on one photo -> (K, 3) keypoints in ORIGINAL pixels
    (same crop/uncrop contract as the detect-pose CLI, cli.py)."""
    import jax.numpy as jnp

    from tpubody.image import ops as img_ops
    from tpubody.models import pose2d
    from tpubody.utils import checkpoint as ckpt_lib

    inp = img_ops.scale_and_crop(
        img, (img.shape[1] / 2.0, img.shape[0] / 2.0),
        max(img.shape[:2]) / 200.0, size)
    raw = ckpt_lib.restore_pytree(ckpt)
    if isinstance(raw, dict) and "meta" in raw:
        meta = raw["meta"]
        model, _ = pose2d.create_pose2d(
            n_keypoints=int(np.asarray(meta["n_keypoints"])),
            features=int(np.asarray(meta["features"])),
            image_size=size, init="shape")
        variables = raw["variables"]
    else:
        model, variables = pose2d.create_pose2d(image_size=size,
                                                init="shape")
        variables = ckpt_lib.restore_pytree(ckpt, variables)
    out = pose2d.detect(model, variables,
                        jnp.asarray(inp[None] / 255.0, jnp.float32))
    kp = np.asarray(out.keypoints[0], np.float64)
    ratio = max(img.shape[:2]) / float(size)
    kp[:, 0] = kp[:, 0] * ratio + (img.shape[1] - max(img.shape[:2])) / 2.0
    kp[:, 1] = kp[:, 1] * ratio + (img.shape[0] - max(img.shape[:2])) / 2.0
    return kp


def eval_fixture(fixture: str, ckpt: str, size: int, thresh: float,
                 conf_min: float) -> dict:
    from tpubody.fit import keypoints as kp_lib
    from tpubody.image import ops as img_ops

    img = img_ops.read_image(os.path.join(fixture, "front_rgb.png"))
    kps = kp_lib.read_openpose_json(
        os.path.join(fixture, "0_keypoints.json"), use_hands=False)
    gt = np.asarray(kps.keypoints[:25], np.float64)         # BODY_25

    pred_model = detect_on_image(img, ckpt, size)           # (K, 3)
    n_model = pred_model.shape[0]

    valid_gt = gt[:, 2] > conf_min
    bbox = gt[valid_gt, :2]
    scale = float(max(bbox.max(axis=0) - bbox.min(axis=0)))

    per_joint = {}
    dists = []
    for slot, smpl_j in _BODY25_FROM_SMPL.items():
        if smpl_j >= n_model or not valid_gt[slot]:
            continue
        d = float(np.linalg.norm(pred_model[smpl_j, :2] - gt[slot, :2]))
        per_joint[_SLOT_NAMES[slot]] = round(d / scale, 3)
        dists.append(d)
    dists = np.asarray(dists)
    return {
        "fixture": os.path.basename(fixture),
        "n_joints": int(dists.size),
        "scale_px": round(scale, 1),
        "pck": float((dists <= thresh * scale).mean()) if dists.size else None,
        "mean_err_norm": round(float(dists.mean() / scale), 4)
        if dists.size else None,
        "per_joint_norm_err": per_joint,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--fixtures", nargs="*", default=list(DEFAULT_FIXTURES))
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--thresh", type=float, default=0.1)
    ap.add_argument("--conf-min", type=float, default=0.3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    results = [eval_fixture(f, args.ckpt, args.size, args.thresh,
                            args.conf_min) for f in args.fixtures]
    pcks = [r["pck"] for r in results if r["pck"] is not None]
    print(json.dumps({
        "metric": f"pose2d_real_photo_pck@{args.thresh}",
        "value": round(float(np.mean(pcks)), 4) if pcks else None,
        "unit": "fraction (vs OpenPose weak GT)",
        "ckpt": args.ckpt,
        "fixtures": results,
    }))


if __name__ == "__main__":
    main()
