"""Linear blend skinning (forward + inverse) and forward kinematics.

TPU-first redesign of the SMPL/SMPLH numpy LBS core
(reference: models/smpl_np.py:168-247, models/smplh_np.py:49-115):

  * blendshape application and skinning are expressed as matmuls/einsums so
    XLA maps them to the MXU,
  * the kinematic chain is composed by an unrolled static loop over the
    (compile-time known) joint tree — at most 52 batched 4x4 matmuls,
  * the per-vertex 4x4 inverse needed for inverse skinning
    (reference: models/smpl_np.py:199,239-246, lib/mesh2smpl_model.py:183-207)
    uses the closed-form affine inverse (3x3 adjugate) instead of a general
    LU factorization,
  * everything is pure-functional and batchable with ``vmap`` over frames.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpubody.core.rotations import rodrigues

# Parity-critical contractions run at full fp32 MXU precision: the TPU
# default (bfloat16 inputs) costs ~4e-4 vertex error, above the <1e-4
# parity budget (BASELINE.md).  These matmuls are small (V x J x 16),
# so the fp32 passes are not on the critical path.
_PREC = jax.lax.Precision.HIGHEST


class LBSOutput(NamedTuple):
    """Outputs of one LBS forward pass."""

    verts: jnp.ndarray        # (..., V, 3) posed vertices (+ translation)
    joints: jnp.ndarray       # (..., J, 3) rest-pose joint locations
    joints_posed: jnp.ndarray  # (..., J, 3) posed joint locations
    rel_transforms: jnp.ndarray  # (..., J, 4, 4) rest-relative joint transforms
    v_posed: jnp.ndarray      # (..., V, 3) blendshaped rest vertices


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble homogeneous transforms from rotations (...,3,3) and
    translations (...,3) -> (...,4,4)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def forward_kinematics(
    R: jnp.ndarray, joints: jnp.ndarray, parents: Sequence[int]
) -> jnp.ndarray:
    """Compose local joint rotations along the kinematic tree.

    Args:
      R: (..., J, 3, 3) local rotations per joint.
      joints: (..., J, 3) rest-pose joint positions.
      parents: length-J static parent indices; parents[0] is ignored (root).

    Returns:
      (..., J, 4, 4) global (world) transforms G with
      G[0] = [R0 | j0], G[i] = G[parent[i]] @ [Ri | j_i - j_parent].
    """
    J = len(parents)
    parr = [0] + [int(p) for p in parents[1:]]
    rel_t = joints - joints[..., jnp.asarray(parr), :]
    rel_t = rel_t.at[..., 0, :].set(joints[..., 0, :])
    A = make_se3(R, rel_t)  # local transforms (..., J, 4, 4)

    # Static unrolled tree composition: J is compile-time constant (24/52),
    # each step is a small batched matmul; XLA pipelines these well.
    # Full fp32 precision: the default bf16 matmul costs ~1e-3 error over
    # the composed chain, blowing the <1e-4 parity budget.
    G = [A[..., 0, :, :]]
    for i in range(1, J):
        G.append(jnp.matmul(G[parents[i]], A[..., i, :, :], precision=_PREC))
    return jnp.stack(G, axis=-3)


def remove_rest_pose(G: jnp.ndarray, joints: jnp.ndarray) -> jnp.ndarray:
    """Convert world joint transforms into rest-relative skinning transforms.

    Equivalent to the reference's ``G - pack(G @ [J; 0])``
    (models/smpl_np.py:192-197) in closed form: the rotation block is kept
    and the translation becomes ``t - R_g @ j``.
    """
    Rg = G[..., :3, :3]
    t = G[..., :3, 3]
    t_rel = t - jnp.einsum("...ij,...j->...i", Rg, joints, precision=_PREC)
    return make_se3(Rg, t_rel)


def affine_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of affine 4x4 matrices [M t; 0 1].

    M is a *blend* of rotations (not orthonormal), so we invert it with the
    3x3 adjugate rather than a transpose.  Replaces the reference's per-vertex
    ``np.linalg.inv(T)`` (models/smpl_np.py:199) with pure vectorized math.
    """
    M = T[..., :3, :3]
    t = T[..., :3, 3]
    # Adjugate of M via cross products of its columns.
    c0, c1, c2 = M[..., :, 0], M[..., :, 1], M[..., :, 2]
    r0 = jnp.cross(c1, c2)
    r1 = jnp.cross(c2, c0)
    r2 = jnp.cross(c0, c1)
    det = jnp.sum(c0 * r0, axis=-1, keepdims=True)[..., None]
    Minv = jnp.stack([r0, r1, r2], axis=-2) / det
    t_inv = -jnp.einsum("...ij,...j->...i", Minv, t, precision=_PREC)
    return make_se3(Minv, t_inv)


def blend_transforms(weights: jnp.ndarray, G_rel: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex blended transforms T = weights @ G_rel.

    Args:
      weights: (V, J) skinning weights.
      G_rel: (..., J, 4, 4) rest-relative joint transforms.

    Returns:
      (..., V, 4, 4).  The contraction is a single (V,J)x(J,16) matmul per
      batch element -> MXU-friendly.
    """
    flat = G_rel.reshape(G_rel.shape[:-2] + (16,))
    T = jnp.einsum(
        "vj,...jk->...vk", weights, flat,
        precision=_PREC, preferred_element_type=flat.dtype,
    )
    return T.reshape(T.shape[:-1] + (4, 4))


def apply_transforms(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply per-point affine transforms: (...,V,4,4) x (...,V,3) -> (...,V,3)."""
    return (
        jnp.einsum("...vij,...vj->...vi", T[..., :3, :3], pts, precision=_PREC)
        + T[..., :3, 3]
    )


def lbs(
    v_template: jnp.ndarray,
    shapedirs: jnp.ndarray,
    posedirs: jnp.ndarray,
    j_regressor: jnp.ndarray,
    weights: jnp.ndarray,
    parents: Sequence[int],
    pose: jnp.ndarray,
    beta: jnp.ndarray,
    trans: Optional[jnp.ndarray] = None,
    pose_is_rotmat: bool = False,
) -> LBSOutput:
    """Full SMPL-family LBS forward pass (unbatched; ``vmap`` over frames).

    Capability parity with models/smpl_np.py:168-202 / smplh_np.py:49-82.

    Args:
      v_template: (V, 3) template vertices.
      shapedirs: (V, 3, S) shape blendshape basis.
      posedirs: (V, 3, 9*(J-1)) pose blendshape basis.
      j_regressor: (J, V) joint regressor.
      weights: (V, J) skinning weights.
      parents: static parent indices.
      pose: (J, 3) axis-angle, or (J, 3, 3) rotmats if ``pose_is_rotmat``.
      beta: (S,) shape coefficients.
      trans: optional (3,) global translation.
    """
    J = len(parents)
    v_shaped = v_template + jnp.einsum(
        "vcs,s->vc", shapedirs, beta,
        precision=_PREC, preferred_element_type=v_template.dtype,
    )
    joints = jnp.einsum(
        "jv,vc->jc", j_regressor, v_shaped,
        precision=_PREC, preferred_element_type=v_shaped.dtype,
    )
    R = pose if pose_is_rotmat else rodrigues(pose.reshape(J, 3))
    pose_feat = (R[1:] - jnp.eye(3, dtype=R.dtype)).reshape(-1)
    v_posed = v_shaped + jnp.einsum(
        "vcp,p->vc", posedirs, pose_feat,
        precision=_PREC, preferred_element_type=v_shaped.dtype,
    )

    G = forward_kinematics(R, joints, parents)
    G_rel = remove_rest_pose(G, joints)
    T = blend_transforms(weights, G_rel)
    verts = apply_transforms(T, v_posed)
    if trans is not None:
        verts = verts + trans
    joints_posed = G[..., :3, 3]
    return LBSOutput(
        verts=verts,
        joints=joints,
        joints_posed=joints_posed,
        rel_transforms=G_rel,
        v_posed=v_posed,
    )


def skin(
    v_template: jnp.ndarray,     # (V, 3) rest-pose vertices
    weights: jnp.ndarray,        # (V, J)
    joints: jnp.ndarray,         # (J, 3) rest-pose joint locations
    parents: Sequence[int],
    pose: jnp.ndarray,           # (J, 3) axis-angle
    trans: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Skin a rigged template with explicit joints (no regressor/blendshapes).

    This is the per-frame animation kernel of rigged avatars (reference
    RecoverModel.compute_R_G + do_skinning, lib/mesh2smpl_model.py:283-314,
    lib/model2video.py:42-81): batched over frames with ``skin_batch`` it is
    the "poses/sec" hot path.
    """
    J = len(parents)
    R = rodrigues(pose.reshape(J, 3))
    G = forward_kinematics(R, joints, parents)
    G_rel = remove_rest_pose(G, joints)
    T = blend_transforms(weights, G_rel)
    verts = apply_transforms(T, v_template)
    if trans is not None:
        verts = verts + trans
    return verts


@functools.partial(jax.jit, static_argnames=("parents",))
def skin_batch(
    v_template: jnp.ndarray,   # (V, 3)
    weights: jnp.ndarray,      # (V, J)
    joints: jnp.ndarray,       # (J, 3)
    parents: Tuple[int, ...],
    poses: jnp.ndarray,        # (F, J, 3)
    trans: Optional[jnp.ndarray] = None,  # (F, 3)
) -> jnp.ndarray:
    """One compiled program skinning F frames (the reference loops frames in
    python, lib/model2video.py:514-522)."""
    trans_axis = 0 if trans is not None else None
    return jax.vmap(
        lambda p, t: skin(v_template, weights, joints, parents, p, t),
        in_axes=(0, trans_axis))(poses, trans)


def inverse_lbs(
    verts: jnp.ndarray,
    weights: jnp.ndarray,
    G_rel: jnp.ndarray,
    trans: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Un-pose vertices: the inverse of :func:`lbs` skinning.

    Given posed vertices and the rest-relative transforms of the pose, return
    the rest-pose (T-pose/blendshaped) vertices.  Capability parity with
    ``SMPLModel.inverse`` (models/smpl_np.py:239-246) and the rigging stage's
    ``to_T_pose`` (lib/mesh2smpl_model.py:183-207).
    """
    if trans is not None:
        verts = verts - trans
    T = blend_transforms(weights, G_rel)
    return apply_transforms(affine_inverse(T), verts)
