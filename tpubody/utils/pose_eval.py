"""Standard 3D pose / mesh evaluation metrics: MPJPE, PA-MPJPE, PVE.

The reference has no quantitative evaluation at all (SURVEY.md §4: no tests,
no benchmarks); these are the field-standard metrics an HMR training loop is
judged by, implemented batched in JAX so validation sweeps run on-device
alongside training (models/hmr_train.py).

Conventions match the common SPIN/HMR evaluation code: errors are mean
per-joint Euclidean distances after root-centering (MPJPE) or after a full
similarity Procrustes alignment (PA-MPJPE, a.k.a. reconstruction error).
Units follow the inputs (meters for SMPL-scale bodies).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def procrustes_align(pred: jnp.ndarray, gt: jnp.ndarray,
                     eps: float = 1e-12) -> jnp.ndarray:
    """Similarity-transform (scale, rotation, translation) alignment of
    ``pred`` onto ``gt``; both (..., J, 3).  Returns the aligned prediction.

    Closed-form orthogonal Procrustes via SVD of the cross-covariance, with
    the reflection guard (det correction) so the rotation is proper.
    """
    mu_p = jnp.mean(pred, axis=-2, keepdims=True)
    mu_g = jnp.mean(gt, axis=-2, keepdims=True)
    xp = pred - mu_p
    xg = gt - mu_g

    var_p = jnp.sum(xp * xp, axis=(-2, -1))                     # (...,)
    K = jnp.einsum("...ji,...jk->...ik", xg, xp)                # (...,3,3)
    U, s, Vt = jnp.linalg.svd(K)
    # Proper rotation: flip the smallest singular direction if det < 0.
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)
    trace = jnp.sum(s * D, axis=-1)
    scale = trace / jnp.maximum(var_p, eps)

    aligned = scale[..., None, None] * jnp.einsum(
        "...jk,...ik->...ij", R, xp)  # rotate each centered point
    return aligned + mu_g


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray,
          root: int | None = 0) -> jnp.ndarray:
    """Mean per-joint position error after root-centering (root=None skips
    centering).  pred/gt: (..., J, 3) -> (...) per-example means."""
    if root is not None:
        pred = pred - pred[..., root:root + 1, :]
        gt = gt - gt[..., root:root + 1, :]
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=-1)


def pa_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned MPJPE (reconstruction error)."""
    return jnp.mean(
        jnp.linalg.norm(procrustes_align(pred, gt) - gt, axis=-1), axis=-1)


def pve(pred_verts: jnp.ndarray, gt_verts: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex error: mean vertex distance, no alignment (both meshes
    assumed in the same frame, e.g. root-centered SMPL outputs)."""
    return jnp.mean(jnp.linalg.norm(pred_verts - gt_verts, axis=-1), axis=-1)


@jax.jit
def evaluate_batch(pred_joints: jnp.ndarray, gt_joints: jnp.ndarray
                   ) -> dict:
    """(B, J, 3) x2 -> {"mpjpe": (B,), "pa_mpjpe": (B,)} in one program."""
    return {"mpjpe": mpjpe(pred_joints, gt_joints),
            "pa_mpjpe": pa_mpjpe(pred_joints, gt_joints)}
