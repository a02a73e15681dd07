"""HMR training step: supervised SMPL-parameter + keypoint regression.

The reference ships HMR weights but no training code (models/hmr.py is
inference-only); a production framework needs the training loop, so this
provides the standard HMR supervision (2D keypoint reprojection + SMPL
parameter / shape losses) as a jittable, shardable train step:

  * pure-functional: (params, batch_stats, opt_state, batch) -> updated,
  * data-parallel over the image batch: jit with a ``frames``-sharded batch
    and replicated params makes XLA psum the gradients over ICI
    (tpubody.dist.mesh); this is the step ``__graft_entry__.
    dryrun_multichip`` compiles on an n-device mesh.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpubody.models import hmr as hmr_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib
from tpubody.render import camera as camera_lib


class TrainBatch(NamedTuple):
    images: jnp.ndarray        # (B, H, W, 3) normalized
    keypoints2d: jnp.ndarray   # (B, K, 3) pixel x, y, conf (crop frame)
    has_smpl: jnp.ndarray      # (B,) 1 where GT SMPL params exist
    gt_rotmats: jnp.ndarray    # (B, 24, 3, 3)
    gt_shape: jnp.ndarray      # (B, 10)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model: hmr_lib.HMR,
    tx: optax.GradientTransformation,
    rng: Optional[jax.Array] = None,
    image_size: int = 224,
) -> TrainState:
    variables = model.init(rng if rng is not None else jax.random.PRNGKey(0),
                           jnp.zeros((1, image_size, image_size, 3)))
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32))


def loss_fn(
    params, batch_stats, model: hmr_lib.HMR,
    smpl_model: params_lib.BodyModelParams,
    batch: TrainBatch,
    rng: jax.Array,
    focal_length: float = 5000.0,
    img_size: float = 224.0,
    w_kp: float = 1.0, w_pose: float = 1.0, w_shape: float = 0.1,
):
    out, updates = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch.images,
        train=True, mutable=["batch_stats"], rngs={"dropout": rng})

    # 2D keypoint reprojection under the weak-perspective camera.
    state = smpl_lib.forward_batch(
        smpl_model, out.rotmats, out.shape, None, pose_is_rotmat=True)
    j3d = jax.vmap(lambda v: smpl_lib.regress_joints(smpl_model, v))(
        state.verts)
    cam_t = camera_lib.weak_perspective_translation(
        out.cam, focal_length, img_size)
    proj = (j3d[..., :2] + cam_t[:, None, :2]) / jnp.maximum(
        j3d[..., 2:3] + cam_t[:, None, 2:3], 1e-2) * focal_length \
        + img_size / 2.0
    conf = batch.keypoints2d[..., 2:3]
    kp_loss = jnp.mean(conf * jnp.abs(proj - batch.keypoints2d[..., :2])
                       / img_size)

    # SMPL parameter supervision where available.
    m = batch.has_smpl[:, None, None, None]
    pose_loss = jnp.sum(m * (out.rotmats - batch.gt_rotmats) ** 2) \
        / jnp.maximum(jnp.sum(batch.has_smpl) * 24 * 9, 1.0)
    shape_loss = jnp.sum(batch.has_smpl[:, None]
                         * (out.shape - batch.gt_shape) ** 2) \
        / jnp.maximum(jnp.sum(batch.has_smpl) * 10, 1.0)

    total = w_kp * kp_loss + w_pose * pose_loss + w_shape * shape_loss
    return total, (updates["batch_stats"],
                   {"kp": kp_loss, "pose": pose_loss, "shape": shape_loss})


def make_eval_step(model: hmr_lib.HMR,
                   smpl_model: params_lib.BodyModelParams):
    """Returns a jittable ``eval_step(state, batch) -> metrics`` computing
    the field-standard 3D metrics (utils.pose_eval) against the batch's GT
    SMPL parameters: MPJPE / PA-MPJPE on regressed joints and PVE on
    vertices, all root-centered model-space (meters for real bodies).
    Examples without GT (has_smpl=0) are masked out of the means."""
    from tpubody.utils import pose_eval

    def joints_and_verts(rotmats, shape):
        state = smpl_lib.forward_batch(
            smpl_model, rotmats, shape, None, pose_is_rotmat=True)
        j3d = jax.vmap(lambda v: smpl_lib.regress_joints(smpl_model, v))(
            state.verts)
        return j3d, state.verts

    def eval_step(state: TrainState, batch: TrainBatch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.images)
        pred_j, pred_v = joints_and_verts(out.rotmats, out.shape)
        gt_j, gt_v = joints_and_verts(batch.gt_rotmats, batch.gt_shape)
        w = batch.has_smpl
        denom = jnp.maximum(jnp.sum(w), 1.0)
        mean = lambda x: jnp.sum(w * x) / denom  # noqa: E731
        return {
            "mpjpe": mean(pose_eval.mpjpe(pred_j, gt_j)),
            "pa_mpjpe": mean(pose_eval.pa_mpjpe(pred_j, gt_j)),
            # PVE root-centered by each body's own root joint.
            "pve": mean(pose_eval.pve(pred_v - pred_j[:, :1],
                                      gt_v - gt_j[:, :1])),
        }

    return eval_step


def make_train_step(model: hmr_lib.HMR,
                    smpl_model: params_lib.BodyModelParams,
                    tx: optax.GradientTransformation,
                    **loss_kw):
    """Returns a jittable ``step(state, batch, rng) -> (state, metrics)``."""

    def train_step(state: TrainState, batch: TrainBatch, rng: jax.Array):
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
                state.params, state.batch_stats, model, smpl_model, batch,
                rng, **loss_kw)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, batch_stats=new_bs,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, **metrics}

    return train_step
