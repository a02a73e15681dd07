"""Camera models: pinhole projection, weak perspective, translation fitting.

Capability parity (re-designed, batched, jit-safe):
  * pinhole world->pixel with the reference's extrinsic convention
    ``x_cam = R @ (x_world + T)`` (utils/J_render.py:44-113 JRender),
  * perspective projection with learnable rotation/translation used by the
    fitting camera (lib/Gen_SMPLH/camera.py:42-117, utils/geometry.py:63-91),
  * weak-perspective HMR camera (s, tx, ty) -> translation,
  * ``estimate_translation``: weighted least-squares camera translation from
    2D/3D joint correspondences (utils/geometry.py:94-157), solved in closed
    form with jnp.linalg.solve on the 3x3 normal equations.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: jnp.ndarray  # scalar
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def make(cls, fx, fy, cx, cy):
        return cls(*(jnp.asarray(v, jnp.float32) for v in (fx, fy, cx, cy)))


def world_to_cam(points: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """``x_cam = R @ (x + T)`` — the JRender extrinsic convention
    (utils/J_render.py:49-63).  points (..., N, 3), R (3,3), T (3,)."""
    return jnp.einsum("ij,...nj->...ni", R, points + T)


def cam_to_pixel(points_cam: jnp.ndarray, K: Intrinsics) -> jnp.ndarray:
    """Perspective divide + intrinsics: (..., N, 3) -> (..., N, 2) pixels."""
    z = points_cam[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-8, jnp.sign(z) * 1e-8 + (z == 0) * 1e-8, z)
    u = points_cam[..., 0:1] / z * K.fx + K.cx
    v = points_cam[..., 1:2] / z * K.fy + K.cy
    return jnp.concatenate([u, v], axis=-1)


def project_points(
    points: jnp.ndarray,
    K: Intrinsics,
    R: Optional[jnp.ndarray] = None,
    T: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full pinhole world->pixel projection (JRender __call__ parity)."""
    if R is None:
        R = jnp.eye(3, dtype=points.dtype)
    if T is None:
        T = jnp.zeros(3, dtype=points.dtype)
    return cam_to_pixel(world_to_cam(points, R, T), K)


def perspective_projection(
    points: jnp.ndarray,       # (B, N, 3)
    rotation: jnp.ndarray,     # (B, 3, 3)
    translation: jnp.ndarray,  # (B, 3)
    focal_length,              # scalar or (B,)
    camera_center: jnp.ndarray,  # (B, 2)
) -> jnp.ndarray:
    """Batch perspective projection with the SMPLify convention
    ``x_cam = R @ x + t`` (utils/geometry.py:63-91, camera.py:104-117)."""
    pts = jnp.einsum("bij,bnj->bni", rotation, points) + translation[:, None, :]
    z = pts[..., 2:3]
    f = jnp.broadcast_to(jnp.asarray(focal_length, pts.dtype), z.shape[:1])
    uv = pts[..., :2] / jnp.maximum(jnp.abs(z), 1e-9) * jnp.sign(z + 1e-30)
    uv = uv * f[:, None, None]
    return uv + camera_center[:, None, :]


def weak_perspective_translation(
    cam: jnp.ndarray, focal_length: float, img_size: float
) -> jnp.ndarray:
    """HMR weak-perspective (s, tx, ty) -> full translation (tx, ty, tz) with
    tz = 2f / (img_size * s) (standard HMR/SPIN convention)."""
    s = jnp.maximum(cam[..., 0], 1e-6)
    tz = 2.0 * focal_length / (img_size * s)
    return jnp.stack([cam[..., 1], cam[..., 2], tz], axis=-1)


def crop_cam_to_orig(
    cam: jnp.ndarray,        # (..., 3) weak-persp (s, tx, ty) in the crop
    center,                  # (..., 2) crop center in original pixels
    scale,                   # (...,) HMR scale (crop side = 200*scale px)
    focal_length: float,
    img_center,              # (2,) original-image principal point
) -> jnp.ndarray:
    """HMR weak-perspective cam predicted on a ``scale_and_crop`` window ->
    full-image perspective translation (tx, ty, tz) for a pinhole camera
    with ``focal_length`` centered at ``img_center`` (the SPIN
    convert_crop_cam_to_orig_img convention).

    Derivation: the crop renders x_crop = 112*s*(X+tx) + 112; mapping crop
    pixels back to the original image (side 200*scale, center ``center``)
    and matching a perspective camera linearizes to
    tz = f / (100*scale*s),  T_xy = t_xy + (center - img_center)*tz/f.
    """
    cam = jnp.asarray(cam, jnp.float32)
    s = jnp.maximum(cam[..., 0], 1e-6)
    scale = jnp.asarray(scale, jnp.float32)
    tz = focal_length / (100.0 * scale * s)
    off = (jnp.asarray(center, jnp.float32)
           - jnp.asarray(img_center, jnp.float32)) \
        * tz[..., None] / focal_length
    return jnp.stack([cam[..., 1] + off[..., 0],
                      cam[..., 2] + off[..., 1], tz], axis=-1)


def estimate_translation(
    joints3d: jnp.ndarray,   # (N, 3)
    joints2d: jnp.ndarray,   # (N, 2) pixels
    conf: jnp.ndarray,       # (N,) confidence weights
    focal_length: float,
    img_center: jnp.ndarray,  # (2,)
) -> jnp.ndarray:
    """Weighted least-squares camera translation.

    Redesign of utils/geometry.py:94-157 (estimate_translation_np): for each
    joint, the projection constraint is linear in (tx, ty, tz); instead of a
    dense (2N x 3) lstsq we form the 3x3 normal equations and solve — tiny,
    jit-friendly, exact.
    """
    x3, y3, z3 = joints3d[:, 0], joints3d[:, 1], joints3d[:, 2]
    u = joints2d[:, 0] - img_center[0]
    v = joints2d[:, 1] - img_center[1]
    f = focal_length
    # Rows: f*(x3+tx) = u*(z3+tz)  ->  f*tx - u*tz = u*z3 - f*x3
    #       f*(y3+ty) = v*(z3+tz)  ->  f*ty - v*tz = v*z3 - f*y3
    zero = jnp.zeros_like(u)
    A = jnp.concatenate([
        jnp.stack([jnp.full_like(u, f), zero, -u], axis=-1),
        jnp.stack([zero, jnp.full_like(v, f), -v], axis=-1),
    ], axis=0)                                    # (2N, 3)
    b = jnp.concatenate([u * z3 - f * x3, v * z3 - f * y3], axis=0)  # (2N,)
    w = jnp.concatenate([conf, conf], axis=0)
    AtA = A.T @ (A * w[:, None])
    Atb = A.T @ (b * w)
    return jnp.linalg.solve(AtA + 1e-8 * jnp.eye(3, dtype=A.dtype), Atb)


class OrthoCamera(NamedTuple):
    """Orthographic-frustum camera matching the opendr renderer setup
    (utils/render_model.py:17-61): vertices are already in image-plane
    coordinates after a rigid transform + scale; rasterization uses x,y as
    pixels and z for depth ordering."""

    scale: jnp.ndarray     # scalar pixels-per-unit
    center: jnp.ndarray    # (2,) pixel center
    flip_y: bool = False

    def to_screen(self, verts: jnp.ndarray) -> jnp.ndarray:
        """(..., V, 3) world -> (..., V, 3) screen (x_pix, y_pix, depth)."""
        xy = verts[..., :2] * self.scale + self.center
        if self.flip_y:
            xy = xy.at[..., 1].multiply(-1.0)
        return jnp.concatenate([xy, verts[..., 2:3]], axis=-1)
