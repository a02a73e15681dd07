"""Self-supervised pose-detector training from the framework's own renderer.

The reference consumes OpenPose output; tpubody additionally ships a
trainable detector (models/pose2d.py).  This pipeline closes the loop with
NO external data: random SMPL bodies are posed (core LBS), shaded (the TPU
rasterizer), and their ground-truth joints projected with the exact same
camera math — producing unlimited (image, keypoints) supervision entirely
on device.  One jitted program synthesizes each batch; a second one takes
the train step.  This is both a working pretraining recipe (domain-randomized
synthetic pose data is a standard recipe for 2D pose) and an end-to-end
exercise of model -> render -> project -> detect across the framework.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpubody.models import params as params_lib
from tpubody.models import pose2d
from tpubody.models import smpl as smpl_lib
from tpubody.render import video as video_lib


def project_like_render(points: jnp.ndarray, cam_t: jnp.ndarray,
                        focal: float, height: int, width: int
                        ) -> jnp.ndarray:
    """Project (..., 3) world points with render_frame's exact camera
    (pre-rotation, flip-YZ, pinhole) so joint labels align with pixels."""
    v = points @ jnp.asarray(video_lib._PRE_ROT.T, points.dtype)
    v = (v + cam_t) @ jnp.asarray(video_lib._FLIP_YZ.T, points.dtype)
    z = jnp.maximum(-v[..., 2:3], 1e-6)
    x = v[..., 0:1] / z * focal + width / 2.0
    y = -v[..., 1:2] / z * focal + height / 2.0
    return jnp.concatenate([x, y, jnp.ones_like(z)], axis=-1)


class SynthBatch(NamedTuple):
    images: jnp.ndarray       # (B, S, S, 3) in [0,1]
    keypoints: jnp.ndarray    # (B, J, 3) pixel x, y, valid


def make_synthesizer(body, size: int = 64, focal: float = 150.0,
                     cam_z: float = 3.0, pose_scale: float = 0.25,
                     window: int = 64):
    """Returns jit-ready ``synth(key, batch) -> SynthBatch``."""
    faces = jnp.asarray(np.asarray(body.faces), jnp.int32)
    cam_t = jnp.asarray([0.0, 0.0, cam_z])
    bg = jnp.ones((size, size, 3)) * 0.15

    def synth(key, batch: int) -> SynthBatch:
        kp_key, c_key = jax.random.split(key)
        poses = pose_scale * jax.random.normal(
            kp_key, (batch, body.num_joints, 3))
        state = smpl_lib.forward_batch(body, poses, jnp.zeros(10), None)
        colors = 0.4 + 0.5 * jax.random.uniform(
            c_key, (body.num_verts, 3))
        imgs = video_lib.render_frames(
            state.verts, faces, colors, cam_t, bg,
            height=size, width=size, focal=focal, window=window)
        kps = project_like_render(state.joints_posed, cam_t, focal,
                                  size, size)
        inside = ((kps[..., 0] >= 0) & (kps[..., 0] < size)
                  & (kps[..., 1] >= 0) & (kps[..., 1] < size))
        kps = kps.at[..., 2].set(inside.astype(jnp.float32))
        return SynthBatch(images=imgs, keypoints=kps)

    return synth


class PoseTrainResult(NamedTuple):
    model: Any
    params: Any
    losses: np.ndarray
    pixel_err_before: float
    pixel_err_after: float


def train_pose2d_synthetic(
    steps: int = 50,
    batch: int = 8,
    size: int = 64,
    n_joints: int = 24,
    n_verts: int = 400,
    features: int = 16,
    lr: float = 1e-3,
    seed: int = 0,
    body=None,
) -> PoseTrainResult:
    """Train a pose2d detector purely on rendered synthetic bodies."""
    if body is None:
        body = params_lib.synthetic(n_joints=n_joints, n_verts=n_verts,
                                    seed=seed)
    synth = make_synthesizer(body, size=size)
    model, variables = pose2d.create_pose2d(
        n_keypoints=body.num_joints, features=features, image_size=size)
    tx = optax.adam(lr)
    opt_state = tx.init(variables)
    synth_fn = jax.jit(synth, static_argnums=1)
    detect_fn = jax.jit(
        lambda p, im: pose2d.detect(model, p, im).keypoints)

    def pixel_err(p, data: SynthBatch) -> float:
        pred = np.asarray(detect_fn(p, data.images))
        gt = np.asarray(data.keypoints)
        valid = gt[..., 2] > 0
        d = np.linalg.norm(pred[..., :2] - gt[..., :2], axis=-1)
        return float(d[valid].mean()) if valid.any() else float("nan")

    key = jax.random.PRNGKey(seed)
    eval_key, key = jax.random.split(key)
    eval_batch = synth_fn(eval_key, batch)
    err0 = pixel_err(variables, eval_batch)

    # TPU-first: the whole training run (synthesize -> step, x chunk) is
    # ONE compiled program via lax.scan — no per-step host dispatch, so
    # throughput is device-bound even through a high-latency tunnel.
    def scan_body(carry, k):
        params, opt_state = carry
        data = synth(k, batch)
        params, opt_state, loss = pose2d.make_train_step(model, tx)(
            params, opt_state, data.images, data.keypoints)
        return (params, opt_state), loss

    chunk = min(steps, 100)

    @jax.jit
    def run_chunk(params, opt_state, keys):
        return jax.lax.scan(scan_body, (params, opt_state), keys)

    params = variables
    losses = []
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        key, k = jax.random.split(key)
        keys = jax.random.split(k, chunk)  # fixed length: one compile
        (params, opt_state), chunk_losses = run_chunk(
            params, opt_state, keys)
        losses.extend(np.asarray(chunk_losses[:n]).tolist())
        # Chunks are fixed-length for a single compile; the final chunk
        # may run up to chunk-1 extra (unrecorded) steps.
        done += chunk
    err1 = pixel_err(params, eval_batch)
    return PoseTrainResult(model=model, params=params,
                           losses=np.asarray(losses),
                           pixel_err_before=err0, pixel_err_after=err1)
