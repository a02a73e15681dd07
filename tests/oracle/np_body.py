"""Float64 numpy oracle for SMPL-family LBS, written independently.

This is the ground truth the JAX/TPU implementation is tested against
(SURVEY.md section 4: "unit-test each JAX kernel against a vendored numpy
oracle").  It follows the SMPL paper equations directly.
"""
from __future__ import annotations

import numpy as np


def rodrigues_np(r: np.ndarray) -> np.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrices, float64."""
    r = np.asarray(r, dtype=np.float64)
    theta = np.linalg.norm(r, axis=-1, keepdims=True)
    theta = np.maximum(theta, np.finfo(np.float64).tiny)
    k = r / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = np.zeros_like(kx)
    K = np.stack(
        [
            np.stack([zero, -kz, ky], axis=-1),
            np.stack([kz, zero, -kx], axis=-1),
            np.stack([-ky, kx, zero], axis=-1),
        ],
        axis=-2,
    )
    c = np.cos(theta)[..., None]
    s = np.sin(theta)[..., None]
    outer = k[..., :, None] * k[..., None, :]
    eye = np.broadcast_to(np.eye(3), outer.shape)
    return c * eye + (1 - c) * outer + s * K


def lbs_np(raw: dict, pose: np.ndarray, beta: np.ndarray, trans: np.ndarray):
    """Full LBS forward in float64.

    Args:
      raw: dict with v_template, shapedirs, posedirs, j_regressor, weights,
        parents (as produced by tpubody.models.params.synthetic_numpy or a
        densified real model).
      pose: (J, 3) axis-angle.  beta: (S,).  trans: (3,).

    Returns:
      dict with verts (V,3), joints (J,3), joints_posed (J,3), T (V,4,4),
      T_inverse (V,4,4), v_posed (V,3).
    """
    v_template = np.asarray(raw["v_template"], dtype=np.float64)
    shapedirs = np.asarray(raw["shapedirs"], dtype=np.float64)
    posedirs = np.asarray(raw["posedirs"], dtype=np.float64)
    j_regressor = np.asarray(raw["j_regressor"], dtype=np.float64)
    weights = np.asarray(raw["weights"], dtype=np.float64)
    parents = list(raw["parents"])
    J = len(parents)

    v_shaped = v_template + shapedirs @ np.asarray(beta, dtype=np.float64)
    joints = j_regressor @ v_shaped
    R = rodrigues_np(np.asarray(pose, dtype=np.float64).reshape(J, 3))

    pose_feat = (R[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + posedirs @ pose_feat

    G = np.zeros((J, 4, 4))
    G[0, :3, :3] = R[0]
    G[0, :3, 3] = joints[0]
    G[0, 3, 3] = 1.0
    for i in range(1, J):
        local = np.eye(4)
        local[:3, :3] = R[i]
        local[:3, 3] = joints[i] - joints[parents[i]]
        G[i] = G[parents[i]] @ local
    joints_posed = G[:, :3, 3].copy()

    # Remove rest-pose joint locations.
    G_rel = G.copy()
    G_rel[:, :3, 3] -= np.einsum("jab,jb->ja", G[:, :3, :3], joints)

    T = np.einsum("vj,jab->vab", weights, G_rel)
    T_inverse = np.linalg.inv(T)
    vh = np.concatenate([v_posed, np.ones((v_posed.shape[0], 1))], axis=1)
    verts = np.einsum("vab,vb->va", T, vh)[:, :3] + np.asarray(trans)

    return dict(
        verts=verts,
        joints=joints,
        joints_posed=joints_posed,
        T=T,
        T_inverse=T_inverse,
        v_posed=v_posed,
        G_rel=G_rel,
    )
