"""2D keypoint detector: heatmap regression for BODY_25 + hands.

The reference delegates 2D pose to the external pyopenpose CUDA binary
(lib/openpose.py:10-38) and consumes its JSON.  This module supplies an
in-framework, TPU-native detector with the same output contract — 67
keypoints (BODY_25 + 2x21 hands, the layout tpubody.fit.keypoints reads) —
so the pipeline can run end-to-end without external native deps, and the
detector can be trained with tpubody.io.dataset on pose datasets.

Design (TPU-first):
  * fully-convolutional encoder/decoder, NHWC, bf16-ready: strided conv
    downsampling to 1/8, residual trunk, transposed-conv upsampling to 1/4
    resolution heatmaps — all MXU-friendly static shapes;
  * decoding is SOFT-ARGMAX (expectation over a spatial softmax), computed
    in-graph: differentiable (usable as a loss), no host round-trip, and
    exact for the unimodal Gaussian targets;
  * confidence = the peak probability mass, matching OpenPose's
    "confidence" column closely enough for joint_weights gating.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

N_KEYPOINTS = 67          # BODY_25 + left hand 21 + right hand 21
HEATMAP_STRIDE = 4


class Pose2DOutput(NamedTuple):
    keypoints: jnp.ndarray   # (B, 67, 3) x, y (input pixels), conf
    heatmaps: jnp.ndarray    # (B, H/4, W/4, 67)


class _ResBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)
        gn = functools.partial(nn.GroupNorm, num_groups=8,
                               dtype=self.dtype)
        y = nn.relu(gn()(conv(self.features, (3, 3))(x)))
        y = gn()(conv(self.features, (3, 3))(y))
        if x.shape[-1] != self.features:
            x = conv(self.features, (1, 1))(x)
        return nn.relu(x + y)


class Pose2D(nn.Module):
    """Heatmap keypoint network.  ``features`` scales capacity."""

    n_keypoints: int = N_KEYPOINTS
    features: int = 64
    n_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3), H and W divisible by 8 ->
        heatmap logits (B, H/4, W/4, n_keypoints)."""
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)
        x = images.astype(self.dtype)
        f = self.features
        x = nn.relu(conv(f, (7, 7), strides=(2, 2))(x))        # 1/2
        x = nn.relu(conv(f * 2, (3, 3), strides=(2, 2))(x))    # 1/4
        x = nn.relu(conv(f * 4, (3, 3), strides=(2, 2))(x))    # 1/8
        for _ in range(self.n_blocks):
            x = _ResBlock(f * 4, dtype=self.dtype)(x)
        x = nn.ConvTranspose(f * 2, (4, 4), strides=(2, 2),
                             dtype=self.dtype)(x)              # 1/4
        x = nn.relu(x)
        logits = nn.Conv(self.n_keypoints, (1, 1),
                         dtype=jnp.float32)(x)
        return logits


def soft_argmax(logits: jnp.ndarray,
                stride: int = HEATMAP_STRIDE) -> jnp.ndarray:
    """(B, h, w, K) logits -> (B, K, 3) x, y in input pixels + confidence.

    Expectation under the per-keypoint spatial softmax; confidence is the
    probability mass within a 1-pixel radius of the peak (sharp unimodal
    map -> ~1, diffuse map -> ~0)."""
    B, h, w, K = logits.shape
    flat = logits.reshape(B, h * w, K)
    prob = jax.nn.softmax(flat, axis=1)
    pmax = jnp.max(prob, axis=1)                     # (B, K)
    grid_y = jnp.arange(h, dtype=jnp.float32)
    grid_x = jnp.arange(w, dtype=jnp.float32)
    py = prob.reshape(B, h, w, K).sum(axis=2)        # (B, h, K)
    px = prob.reshape(B, h, w, K).sum(axis=1)        # (B, w, K)
    y = jnp.einsum("bhk,h->bk", py, grid_y)
    x = jnp.einsum("bwk,w->bk", px, grid_x)
    # to input pixel coordinates (center of the stride cell)
    x = x * stride + (stride - 1) / 2.0
    y = y * stride + (stride - 1) / 2.0
    # confidence: peak mass scaled so an ideal 2px-sigma Gaussian ~ 1
    conf = jnp.clip(pmax * (2.0 * jnp.pi * 4.0), 0.0, 1.0)
    return jnp.stack([x, y, conf], axis=-1)


def detect(model: Pose2D, variables, images: jnp.ndarray) -> Pose2DOutput:
    """images (B, H, W, 3) -> keypoints (B, 67, 3).  Jit-friendly."""
    logits = model.apply(variables, images)
    return Pose2DOutput(keypoints=soft_argmax(logits), heatmaps=logits)


def create_pose2d(
    n_keypoints: int = N_KEYPOINTS,
    features: int = 64,
    dtype: Any = jnp.float32,
    image_size: int = 256,
    rng: Optional[jax.Array] = None,
    init: str = "real",
) -> Tuple[Pose2D, Any]:
    """``init="shape"`` materializes variables without compiling the
    forward program (utils.flaxtools.shape_init) — for checkpoint-restore
    targets and tests."""
    model = Pose2D(n_keypoints=n_keypoints, features=features, dtype=dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    example = jnp.zeros((1, image_size, image_size, 3))
    if init == "shape":
        from tpubody.utils.flaxtools import shape_init

        variables = shape_init(model, example, rng=rng)
    else:
        variables = model.init(rng, example)
    return model, variables


# --- training -----------------------------------------------------------

def make_target_heatmaps(keypoints: jnp.ndarray, hw: Tuple[int, int],
                         sigma: float = 2.0,
                         stride: int = HEATMAP_STRIDE) -> jnp.ndarray:
    """(B, K, 3) pixel keypoints -> (B, h, w, K) Gaussian targets.
    Keypoints with conf <= 0 produce all-zero maps (masked in the loss)."""
    B, K, _ = keypoints.shape
    h, w = hw
    cy = (keypoints[..., 1] - (stride - 1) / 2.0) / stride   # (B, K)
    cx = (keypoints[..., 0] - (stride - 1) / 2.0) / stride
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    d2 = ((yy - cy[:, None, None, :]) ** 2
          + (xx - cx[:, None, None, :]) ** 2)
    g = jnp.exp(-d2 / (2.0 * sigma ** 2))
    valid = (keypoints[..., 2] > 0).astype(jnp.float32)
    return g * valid[:, None, None, :]


def heatmap_loss(logits: jnp.ndarray, keypoints: jnp.ndarray,
                 sigma: float = 2.0) -> jnp.ndarray:
    """Softmax cross-entropy against normalized Gaussian targets, masked by
    keypoint validity — scale-invariant and matched to soft-argmax."""
    B, h, w, K = logits.shape
    target = make_target_heatmaps(keypoints, (h, w), sigma)
    tflat = target.reshape(B, h * w, K)
    tsum = jnp.maximum(tflat.sum(axis=1, keepdims=True), 1e-6)
    tnorm = tflat / tsum
    logp = jax.nn.log_softmax(logits.reshape(B, h * w, K), axis=1)
    valid = (keypoints[..., 2] > 0).astype(jnp.float32)
    ce = -jnp.sum(tnorm * logp, axis=1)              # (B, K)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def make_train_step(model: Pose2D, tx):
    """(params, opt_state, images, keypoints) -> updated + loss; jit it."""
    import optax

    def step(params, opt_state, images, keypoints):
        def lossf(p):
            logits = model.apply(p, images)
            return heatmap_loss(logits, keypoints)

        loss, grads = jax.value_and_grad(lossf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def keypoints_to_openpose(keypoints: np.ndarray) -> dict:
    """(67, 3) -> the OpenPose JSON people-entry layout
    (pose_keypoints_2d 75, hand_left/right_keypoints_2d 63 each)."""
    kp = np.asarray(keypoints, np.float64)
    return {
        "pose_keypoints_2d": kp[:25].reshape(-1).tolist(),
        "hand_left_keypoints_2d": kp[25:46].reshape(-1).tolist(),
        "hand_right_keypoints_2d": kp[46:67].reshape(-1).tolist(),
    }
