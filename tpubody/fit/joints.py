"""Extra surface joints + OpenPose-ordered joint extraction for SMPLH.

The reference gets nose/eye/ear/toe/fingertip "joints" from fixed mesh
vertices via smplx's VertexJointSelector, then permutes with JointMapper
(lib/gen_smplh.py:73, data_parser.py:137-181).  This module reproduces that:
21 standard SMPL(H) surface-vertex ids appended after the 52 model joints
gives the 73-joint set the OpenPose mapping indexes into.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpubody.fit import keypoints as kp_lib

# Standard SMPL/SMPLH surface-vertex ids for the extra joints, in the order
# they are appended after the model joints (nose..heels, then fingertips) —
# the public smplx vertex_ids table the reference relies on.
SMPLH_EXTRA_VERTEX_IDS = np.array([
    332,    # nose
    6260,   # right eye
    2800,   # left eye
    4071,   # right ear
    583,    # left ear
    3216, 3226, 3387,   # left big toe, small toe, heel
    6617, 6624, 6787,   # right big toe, small toe, heel
    2746, 2319, 2445, 2556, 2673,   # left thumb/index/middle/ring/pinky tip
    6191, 5782, 5905, 6016, 6133,   # right fingertips
], np.int64)


def extra_vertex_ids(num_verts: int, n_joints: int = 52) -> np.ndarray:
    """The standard table for the real 6890-vertex template; clipped ids as
    a graceful fallback for synthetic test meshes.  SMPL (24 joints) has no
    fingertips — only the 11 nose/eye/ear/toe/heel extras apply."""
    table = (SMPLH_EXTRA_VERTEX_IDS if n_joints == 52
             else SMPLH_EXTRA_VERTEX_IDS[:11])
    if num_verts >= 6890:
        return table
    return np.clip(table, 0, num_verts - 1)


def openpose_joints(
    verts: jnp.ndarray,       # (V, 3) posed vertices
    joints: jnp.ndarray,      # (52, 3) SMPLH or (24, 3) SMPL posed joints
    use_hands: bool = True,
    vertex_ids: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Joints in OpenPose order: (67, 3) [body25, lhand21, rhand21] for
    SMPLH (or (25, 3) with use_hands=False), (25, 3) body for SMPL."""
    n_j = joints.shape[-2]
    if vertex_ids is None:
        vertex_ids = extra_vertex_ids(verts.shape[-2], n_joints=n_j)
    extra = verts[..., jnp.asarray(vertex_ids), :]
    full = jnp.concatenate([joints, extra], axis=-2)
    if n_j == 52:
        mapping = jnp.asarray(kp_lib.smplh_to_openpose(use_hands))
    elif n_j == 24:
        mapping = jnp.asarray(kp_lib.smpl_to_openpose())
    else:
        raise ValueError(f"unsupported joint count {n_j} (24 or 52)")
    return full[..., mapping, :]
