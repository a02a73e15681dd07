"""Rotation representations, batched and jit/vmap friendly.

Capability parity (re-designed, not translated):
  - axis-angle -> rotmat   (reference: models/smpl_np.py:208-228,
    utils/geometry.py:9-23)
  - quaternion -> rotmat   (reference: utils/geometry.py:25-45)
  - 6D rotation -> rotmat  (reference: utils/geometry.py:47-61, Zhou et al.)
  - rotmat -> axis-angle   (reference: transforms3d mat2axangle use at
    models/smpl_np.py:106-109, vposer matrot2aa)

All functions operate on arbitrary leading batch dimensions and are pure
(functional) so they fuse cleanly under XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def rodrigues(r: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors -> rotation matrices (Rodrigues' formula).

    Args:
      r: (..., 3) axis-angle rotation vectors.

    Returns:
      (..., 3, 3) rotation matrices.  ``r == 0`` maps to identity and has
      finite gradients (squared-norm epsilon guard).
    """
    r = jnp.asarray(r)
    sq = jnp.sum(r * r, axis=-1, keepdims=True)
    theta = jnp.sqrt(sq + _EPS)
    k = r / theta  # unit axis
    cos = jnp.cos(theta)[..., None]
    sin = jnp.sin(theta)[..., None]

    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    # Cross-product (skew) matrix K of the unit axis.
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    outer = k[..., :, None] * k[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), outer.shape)
    return cos * eye + (1.0 - cos) * outer + sin * K


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternions (w, x, y, z) -> rotation matrices.

    Args:
      quat: (..., 4), not necessarily normalized.

    Returns:
      (..., 3, 3) rotation matrices.
    """
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            ww + xx - yy - zz, 2 * (xy - wz), 2 * (wy + xz),
            2 * (wz + xy), ww - xx + yy - zz, 2 * (yz - wx),
            2 * (xz - wy), 2 * (wx + yz), ww - xx - yy + zz,
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> quaternion (w, x, y, z)."""
    theta = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True) + _EPS)
    half = theta * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * (r / theta)], axis=-1)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> rotation matrices (Gram-Schmidt).

    Matches the column convention of the reference HMR head
    (utils/geometry.py:47-61): the 6 numbers are the first two *columns*
    of the rotation matrix, read as ``x.reshape(..., 3, 2)``.

    Args:
      x: (..., 6)

    Returns:
      (..., 3, 3)
    """
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1, a2 = m[..., 0], m[..., 1]

    # sqrt(sum^2 + eps) instead of norm().clip(): norm has a NaN gradient at
    # exactly 0 (e.g. a freshly-initialized VPoser decoder at z=0), which
    # would poison L-BFGS fitting.
    def _safe_normalize(v):
        return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + _EPS)

    b1 = _safe_normalize(a1)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = _safe_normalize(a2 - proj * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices -> 6D representation.

    Inverse of :func:`rot6d_to_rotmat`: the first two columns, laid out so
    that ``x.reshape(..., 3, 2)`` recovers them (the reference's
    ``x.view(-1, 3, 2)`` convention).
    """
    return R[..., :, :2].reshape(R.shape[:-2] + (6,))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices -> quaternions (w, x, y, z), branch-free.

    Uses the Shepperd/Markley max-trace selection implemented with
    ``jnp.where`` so it is vmap/jit safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # Four candidate constructions, each stable in a different region.
    qw0 = _safe_sqrt(1.0 + m00 + m11 + m22) * 0.5
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
         (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 0.5
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
         (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = _safe_sqrt(1.0 - m00 + m11 - m22) * 0.5
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
         (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = _safe_sqrt(1.0 - m00 - m11 + m22) * 0.5
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
         (m12 + m21) / (4 * qz3), qz3], axis=-1)

    trace = m00 + m11 + m22
    cond0 = (trace > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rotmat_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices -> axis-angle vectors."""
    q = rotmat_to_quat(R)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    axis = xyz / jnp.maximum(sin_half, _EPS)
    return axis * theta
