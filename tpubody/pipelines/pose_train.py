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
    # Ground truth for HMR-style supervision (io/dataset.py
    # rendered_hmr_dataset); None-free so the batch stays one pytree.
    poses: jnp.ndarray = ()     # (B, J, 3) axis-angle body pose
    betas: jnp.ndarray = ()     # (10,) shared shape
    global_R: jnp.ndarray = ()  # (B, 3, 3) domain-rand world rotation


def _yaw_pitch_roll(key, batch: int, yaw_scale: float,
                    tilt_scale: float) -> jnp.ndarray:
    """(batch, 3, 3) rotations: uniform yaw, small gaussian pitch/roll."""
    ky, kp, kr = jax.random.split(key, 3)
    yaw = yaw_scale * jax.random.uniform(ky, (batch,), minval=-jnp.pi,
                                         maxval=jnp.pi)
    pitch = tilt_scale * jax.random.normal(kp, (batch,))
    roll = tilt_scale * jax.random.normal(kr, (batch,))
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    Ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], -1).reshape(-1, 3, 3)
    Rx = jnp.stack([o, z, z, z, cp, -sp, z, sp, cp], -1).reshape(-1, 3, 3)
    Rz = jnp.stack([cr, -sr, z, sr, cr, z, z, z, o], -1).reshape(-1, 3, 3)
    return Ry @ Rx @ Rz


def make_synthesizer(body, size: int = 64, focal: float = 150.0,
                     cam_z: Optional[float] = None,
                     pose_scale: float = 0.25,
                     window: int = 64, domain_rand: bool = False,
                     n_occluders: int = 2):
    """Returns jit-ready ``synth(key, batch) -> SynthBatch``.

    ``domain_rand=True`` adds the randomizations that matter for transfer
    (standard synthetic-pose-pretraining recipe): uniform global yaw +
    small pitch/roll, camera depth/offset jitter, low-frequency textured
    backgrounds, photometric jitter, and random occluding rectangles
    (keypoints under an occluder keep valid=1 — the net must learn
    amodal localization, as OpenPose does for occluded joints).
    """
    faces = jnp.asarray(np.asarray(body.faces), jnp.int32)

    # The render path (video.render_frame / project_like_render) applies
    # the reference's -pi/2 x pre-rotation (model2video.py:300-309),
    # which maps world +y onto the OPTICAL axis — a y-up standing body
    # would be viewed top-down.  Pre-rotate by +pi/2 about x so the two
    # cancel: the image is then a STANDARD pinhole looking down +z at the
    # y-up body (frontal view, height along image y), and pose/rotation
    # labels stay in plain world coordinates.
    _R_UP = jnp.asarray([[1.0, 0.0, 0.0],
                         [0.0, 0.0, -1.0],
                         [0.0, 1.0, 0.0]], jnp.float32)

    # Auto-framing in the (post-cancellation) camera frame: center the
    # subject and pick a depth that fits its whole extent (with
    # pose-variation margin) in ~70% of the crop — the 1.7 m humanoid and
    # the 0.8 m blob both frame correctly.
    v0 = np.asarray(body.v_template)
    center0 = (v0.min(axis=0) + v0.max(axis=0)) / 2.0
    extent = float((v0.max(axis=0) - v0.min(axis=0))[:2].max()) * 1.35
    depth_half = float(v0[:, 2].max() - v0[:, 2].min()) * 0.75 + 0.05
    if cam_z is None:
        cam_z = max(extent * focal / (0.70 * size), 1e-3) + depth_half
    base_t = jnp.asarray([-center0[0], -center0[1],
                          cam_z - center0[2]], jnp.float32)

    def synth(key, batch: int) -> SynthBatch:
        (kp_key, c_key, rot_key, cam_key, bg_key, photo_key,
         occ_key, beta_key) = jax.random.split(key, 8)
        poses = pose_scale * jax.random.normal(
            kp_key, (batch, body.num_joints, 3))
        betas = (0.5 * jax.random.normal(beta_key, (10,))
                 if domain_rand else jnp.zeros(10))
        state = smpl_lib.forward_batch(body, poses, betas, None)
        verts, joints = state.verts, state.joints_posed

        R = jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))
        if domain_rand:
            # Global orientation: rotate verts+joints about the body center.
            R = _yaw_pitch_roll(rot_key, batch, 1.0, 0.15)
            center = verts.mean(axis=1, keepdims=True)
            verts = (verts - center) @ jnp.swapaxes(R, 1, 2) + center
            joints = ((joints - center) @ jnp.swapaxes(R, 1, 2) + center)
            # Camera jitter: depth and image-plane offset.
            kz, kxy = jax.random.split(cam_key)
            dz = jax.random.uniform(kz, (batch, 1), minval=-0.25,
                                    maxval=0.45)
            dxy = 0.07 * extent * jax.random.normal(kxy, (batch, 2))
            cam_t = base_t + jnp.concatenate(
                [dxy, cam_z * dz], axis=-1)               # (B, 3)
            # Low-frequency textured background per example.
            coarse = jax.random.uniform(bg_key, (batch, 6, 6, 3))
            bg = jax.image.resize(coarse, (batch, size, size, 3),
                                  "cubic")
        else:
            cam_t = jnp.broadcast_to(base_t, (batch, 3))
            bg = jnp.broadcast_to(jnp.ones(3) * 0.15,
                                  (batch, size, size, 3))

        # Cancel the render path's -pi/2 x pre-rotation (see _R_UP above).
        verts = verts @ _R_UP.T
        joints = joints @ _R_UP.T

        colors = 0.4 + 0.5 * jax.random.uniform(c_key, (body.num_verts, 3))
        imgs = jax.vmap(
            lambda v, t, b: video_lib.render_frame(
                v, faces, colors, t, b, height=size, width=size,
                focal=focal, window=window))(verts, cam_t, bg)
        kps = jax.vmap(
            lambda j, t: project_like_render(j, t, focal, size, size)
        )(joints, cam_t)

        if domain_rand:
            # Photometric jitter: per-example brightness/contrast/channel
            # gain, then random occluding rectangles (labels unchanged).
            kb, kc, kg, ko = jax.random.split(photo_key, 4)
            bright = 0.15 * jax.random.normal(kb, (batch, 1, 1, 1))
            contr = 1.0 + 0.25 * jax.random.normal(kc, (batch, 1, 1, 1))
            gain = 1.0 + 0.12 * jax.random.normal(kg, (batch, 1, 1, 3))
            imgs = (imgs - 0.5) * contr * gain + 0.5 + bright
            yy = jnp.arange(size, dtype=jnp.float32)[None, :, None]
            xx = jnp.arange(size, dtype=jnp.float32)[None, None, :]
            for i in range(n_occluders):
                kc1, kc2, kc3, ko = jax.random.split(
                    jax.random.fold_in(occ_key, i), 4)
                cxy = size * jax.random.uniform(kc1, (batch, 2))
                wh = size * jax.random.uniform(kc2, (batch, 2),
                                               minval=0.05, maxval=0.22)
                col = jax.random.uniform(kc3, (batch, 1, 1, 3))
                inside = ((jnp.abs(yy - cxy[:, 0:1, None]) < wh[:, 0:1, None])
                          & (jnp.abs(xx - cxy[:, 1:2, None])
                             < wh[:, 1:2, None]))
                imgs = jnp.where(inside[..., None], col, imgs)
            imgs = jnp.clip(imgs, 0.0, 1.0)

        inside = ((kps[..., 0] >= 0) & (kps[..., 0] < size)
                  & (kps[..., 1] >= 0) & (kps[..., 1] < size))
        kps = kps.at[..., 2].set(inside.astype(jnp.float32))
        return SynthBatch(images=imgs, keypoints=kps,
                          poses=poses, betas=betas, global_R=R)

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
    n_verts: int = 1200,    # enough for the capsule humanoid's min res
    features: int = 16,
    lr: float = 1e-3,
    seed: int = 0,
    body=None,
    domain_rand: bool = False,
    init_params=None,
    on_chunk=None,
    chunk: int = 100,
) -> PoseTrainResult:
    """Train a pose2d detector purely on rendered synthetic bodies.

    ``init_params`` resumes from an earlier run's variables (a crashed
    device worker then costs at most one checkpoint interval, not the
    run); ``on_chunk(params, steps_done)`` is called after every compiled
    chunk — the CLI uses it for periodic checkpointing."""
    if body is None:
        # Structured capsule humanoid when the budget allows: humanlike
        # silhouettes and limb keypoint semantics (the blob's scattered
        # point cloud teaches nothing transferable).
        try:
            from tpubody.models import humanoid as humanoid_lib

            body = humanoid_lib.humanoid(n_joints=n_joints,
                                         n_verts=n_verts, seed=seed)
        except ValueError:
            body = params_lib.synthetic(n_joints=n_joints,
                                        n_verts=n_verts, seed=seed)
    synth = make_synthesizer(body, size=size, domain_rand=domain_rand)
    model, variables = pose2d.create_pose2d(
        n_keypoints=body.num_joints, features=features, image_size=size)
    if init_params is not None:
        variables = init_params
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

    # chunk: steps per compiled scan program.  100 amortizes dispatch
    # best; smaller chunks (10-20) keep the program small enough for
    # toolchains whose compiler/runtime faults on the big scan.
    chunk = min(steps, max(1, int(chunk)))

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
        if on_chunk is not None:
            on_chunk(params, done)
    err1 = pixel_err(params, eval_batch)
    return PoseTrainResult(model=model, params=params,
                           losses=np.asarray(losses),
                           pixel_err_before=err0, pixel_err_after=err1)
