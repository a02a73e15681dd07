"""Image utilities: IO, resize/crop, keypoint drawing.

Covers the live-path functions of the reference's utility grab-bag
(utils/image_processing.py — read_image :281, draw_key_point_in_image
:1011 — and utils/image.py:10-59 resize_img / scale_and_crop used by HMR
preprocessing).  Resizing/cropping for the device path is pure JAX
(jax.image.resize — runs on TPU, batchable); drawing and file IO stay
host-side.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def read_image(path: str, rgb: bool = True) -> np.ndarray:
    """Read an image file -> (H, W, 3) uint8 (RGB by default)."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img[:, :, ::-1].copy() if rgb else img


def write_image(path: str, img: np.ndarray, rgb: bool = True) -> None:
    import cv2
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
    cv2.imwrite(path, a[:, :, ::-1] if (rgb and a.ndim == 3) else a)


def resize_image(img: jnp.ndarray, height: int, width: int,
                 method: str = "linear") -> jnp.ndarray:
    """Resize (H, W, C) or (B, H, W, C) on device (utils/image.py resize_img
    parity, TPU-native via jax.image.resize)."""
    img = jnp.asarray(img)
    if img.ndim == 3:
        shape = (height, width, img.shape[-1])
    else:
        shape = (img.shape[0], height, width, img.shape[-1])
    return jax.image.resize(img, shape, method=method)


def scale_and_crop(img: np.ndarray, center: Sequence[float],
                   scale: float, size: int = 224,
                   host: bool = True) -> np.ndarray:
    """Crop a square window of side ``scale*200`` around ``center`` (the
    HMR convention, utils/image.py:20-59) with edge padding, then resize to
    ``size`` x ``size``.

    ``host=True`` (default) resizes with cv2 on the host — per-example
    preprocessing must NOT bounce through the accelerator: every distinct
    crop shape would trigger a fresh XLA compile, and each call pays a
    device round-trip.  ``host=False`` uses jax.image.resize for callers
    already operating on device-resident, fixed-shape data."""
    img = np.asarray(img)
    H, W = img.shape[:2]
    half = scale * 200.0 / 2.0
    cx, cy = float(center[0]), float(center[1])
    x0, x1 = int(round(cx - half)), int(round(cx + half))
    y0, y1 = int(round(cy - half)), int(round(cy + half))

    pad_x0, pad_y0 = max(0, -x0), max(0, -y0)
    pad_x1, pad_y1 = max(0, x1 - W), max(0, y1 - H)
    crop = img[max(0, y0):min(H, y1), max(0, x0):min(W, x1)]
    if any((pad_x0, pad_x1, pad_y0, pad_y1)):
        crop = np.pad(crop, ((pad_y0, pad_y1), (pad_x0, pad_x1), (0, 0)),
                      mode="edge")
    if host:
        import cv2
        return cv2.resize(np.asarray(crop, np.float32), (size, size),
                          interpolation=cv2.INTER_LINEAR)
    out = resize_image(jnp.asarray(crop, jnp.float32), size, size)
    return np.asarray(out)


def normalize_for_hmr(img: np.ndarray) -> np.ndarray:
    """uint8/float RGB -> ImageNet-normalized float32 (B?, H, W, 3)."""
    a = np.asarray(img, np.float32)
    if a.max() > 1.5:
        a = a / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (a - mean) / std


def crop_from_keypoints(keypoints: np.ndarray,
                        margin: float = 1.2) -> Tuple[np.ndarray, float]:
    """(center, scale) of the person bbox from 2D keypoints with conf>0."""
    kp = np.asarray(keypoints)
    valid = kp[:, 2] > 0 if kp.shape[1] > 2 else np.ones(len(kp), bool)
    pts = kp[valid][:, :2]
    lo, hi = pts.min(0), pts.max(0)
    center = (lo + hi) / 2.0
    scale = margin * max(hi - lo) / 200.0
    return center, float(scale)


def draw_keypoints(img: np.ndarray, keypoints: np.ndarray,
                   radius: int = 3, color=(255, 0, 0),
                   skeleton: Optional[Iterable[Tuple[int, int]]] = None,
                   ) -> np.ndarray:
    """Overlay keypoints (and optional skeleton bones) on an image
    (reference draw_key_point_in_image, utils/image_processing.py:1011)."""
    import cv2
    out = np.ascontiguousarray(np.asarray(img).copy())
    kp = np.asarray(keypoints)
    conf = kp[:, 2] if kp.shape[1] > 2 else np.ones(len(kp))
    for (x, y), c in zip(kp[:, :2], conf):
        if c > 0:
            cv2.circle(out, (int(round(x)), int(round(y))), radius,
                       color, -1)
    if skeleton is not None:
        for a, b in skeleton:
            if conf[a] > 0 and conf[b] > 0:
                cv2.line(out,
                         (int(round(kp[a, 0])), int(round(kp[a, 1]))),
                         (int(round(kp[b, 0])), int(round(kp[b, 1]))),
                         color, 1)
    return out


# OpenPose BODY_25 skeleton bone pairs for visualization.
BODY25_SKELETON = (
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7), (1, 8),
    (8, 9), (9, 10), (10, 11), (8, 12), (12, 13), (13, 14), (0, 15),
    (15, 17), (0, 16), (16, 18), (11, 22), (22, 23), (11, 24),
    (14, 19), (19, 20), (14, 21),
)
