"""Post-training int8 quantization (PTQ) for HMR inference.

The flagship serving cost is the ResNet-50 backbone's bf16 convolutions
(docs/STATUS.md: ~42 ms of the 42.8 ms batch-512 step).  TPU v5e executes
int8 matmuls/convolutions at ~2x the bf16 rate, so a standard PTQ pipeline —
fold inference BatchNorm into the convolutions, quantize weights per output
channel and activations per tensor (symmetric, scale-only) — is the next
rung on the throughput ladder.

Three pieces, all functional (no Flax module, params are explicit pytrees):

  * :func:`fold_batchnorm` — exact algebraic fold of the inference-mode BN
    affine into each conv's weights + a new bias.  The folded f32 network is
    bit-for-bit equivalent to ``hmr.HMR.apply`` in inference mode (pinned by
    tests to ~1e-4).
  * :func:`calibrate` — run the folded network on representative images
    recording per-conv-input absolute maxima -> activation scales.
  * :func:`quantize` / :func:`forward` — int8 weights + scales; at runtime
    each conv quantizes its input tensor, accumulates in int32 on the MXU
    (``preferred_element_type``), and dequantizes into the f32 epilogue
    (bias + relu + residual adds stay f32).

The IEF head stays in f32 — it is ~0.1% of the FLOPs and parity-critical.

Experimental: numerics are exercised on synthetic weights/images by
tests/test_hmr_quant.py; a real accuracy budget needs a trained checkpoint
(the reference ships none — models/hmr.py is vestigial there too).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpubody.core.rotations import rot6d_to_rotmat
from tpubody.models import hmr as hmr_lib

STAGE_SIZES = (3, 4, 6, 3)

# strides/padding are static pytree metadata: they select the compiled
# convolution configuration and must never become tracers when a whole
# parameter tree is passed through jit.
_static = dict(static=True)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FoldedConv:
    w: jnp.ndarray          # (H, W, I, O) f32, BN-folded
    b: jnp.ndarray          # (O,) f32
    strides: Tuple[int, int] = dataclasses.field(metadata=_static)
    padding: Any = dataclasses.field(metadata=_static)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QConv:
    w: jnp.ndarray          # (H, W, I, O) int8
    w_scale: jnp.ndarray    # (O,) f32 per-output-channel
    b: jnp.ndarray          # (O,) f32
    x_scale: jnp.ndarray    # () f32 per-tensor input scale
    strides: Tuple[int, int] = dataclasses.field(metadata=_static)
    padding: Any = dataclasses.field(metadata=_static)


def _conv(x, w, strides, padding, prefer=None):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer)


def _fold(kernel, bn, eps=1e-5):
    """Fold an inference BatchNorm (scale, bias, mean, var) into (w, b)."""
    g = bn["scale"] / jnp.sqrt(bn["var"] + eps)
    return kernel * g[None, None, None, :], bn["bias"] - bn["mean"] * g


def fold_batchnorm(variables: dict) -> dict:
    """HMR Flax variables -> folded-conv pytree mirroring the backbone.

    Returns {"stem": FoldedConv, "blocks": [[{conv1,conv2,conv3[,down]}]],
    "head": {fc1,fc2,decpose,decshape,deccam}} (head params unchanged).
    """
    p = variables["params"]["backbone"]
    bs = variables["batch_stats"]["backbone"]

    def bn_of(scope):
        node_p, node_s = p, bs
        for k in scope[:-1]:
            node_p, node_s = node_p[k], node_s[k]
        k = scope[-1]
        return {"scale": node_p[k]["scale"], "bias": node_p[k]["bias"],
                "mean": node_s[k]["mean"], "var": node_s[k]["var"]}

    w, b = _fold(p["conv1"]["kernel"], bn_of(("bn1",)))
    stem = FoldedConv(w=w, b=b, strides=(2, 2), padding=((3, 3), (3, 3)))

    blocks: List[List[Dict[str, FoldedConv]]] = []
    for i, n_blocks in enumerate(STAGE_SIZES):
        stage = []
        for j in range(n_blocks):
            name = f"layer{i + 1}_{j}"
            node = p[name]
            strides = (2, 2) if (j == 0 and i > 0) else (1, 1)
            blk: Dict[str, FoldedConv] = {}
            w, b = _fold(node["conv1"]["kernel"], bn_of((name, "bn1")))
            blk["conv1"] = FoldedConv(w, b, (1, 1), ((0, 0), (0, 0)))
            w, b = _fold(node["conv2"]["kernel"], bn_of((name, "bn2")))
            blk["conv2"] = FoldedConv(w, b, strides, ((1, 1), (1, 1)))
            w, b = _fold(node["conv3"]["kernel"], bn_of((name, "bn3")))
            blk["conv3"] = FoldedConv(w, b, (1, 1), ((0, 0), (0, 0)))
            if "downsample_conv" in node:
                w, b = _fold(node["downsample_conv"]["kernel"],
                             bn_of((name, "downsample_bn")))
                blk["down"] = FoldedConv(w, b, strides, ((0, 0), (0, 0)))
            stage.append(blk)
        blocks.append(stage)

    head = {k: variables["params"][k]
            for k in ("fc1", "fc2", "decpose", "decshape", "deccam")}
    return {"stem": stem, "blocks": blocks, "head": head}


def _backbone_f32(folded: dict, x: jnp.ndarray, observe=None) -> jnp.ndarray:
    """Folded-f32 backbone forward; ``observe(name, x)`` hooks each conv
    input (calibration).  Returns (B, 2048) pooled features."""
    def conv(fc: FoldedConv, x, name):
        if observe is not None:
            observe(name, x)
        return _conv(x, fc.w, fc.strides, fc.padding) + fc.b

    x = conv(folded["stem"], x, "stem")
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    for i, stage in enumerate(folded["blocks"]):
        for j, blk in enumerate(stage):
            name = f"l{i}_{j}"
            y = jax.nn.relu(conv(blk["conv1"], x, name + ".c1"))
            y = jax.nn.relu(conv(blk["conv2"], y, name + ".c2"))
            y = conv(blk["conv3"], y, name + ".c3")
            res = conv(blk["down"], x, name + ".dn") if "down" in blk else x
            x = jax.nn.relu(y + res)
    return jnp.mean(x, axis=(1, 2))


def _ief_head(head: dict, xf: jnp.ndarray, mean_params: np.ndarray,
              n_iter: int = 3) -> hmr_lib.HMROutput:
    """f32 IEF loop on pooled features (hmr.HMR.__call__ parity)."""
    B = xf.shape[0]
    mean = jnp.asarray(mean_params, jnp.float32)
    pose = jnp.broadcast_to(mean[:hmr_lib.NPOSE], (B, hmr_lib.NPOSE))
    shape = jnp.broadcast_to(mean[hmr_lib.NPOSE:hmr_lib.NPOSE + 10], (B, 10))
    cam = jnp.broadcast_to(mean[hmr_lib.NPOSE + 10:], (B, 3))
    dense = lambda prm, v: v @ prm["kernel"] + prm["bias"]  # noqa: E731
    for _ in range(n_iter):
        xc = jnp.concatenate([xf, pose, shape, cam], axis=-1)
        h = jax.nn.relu(dense(head["fc1"], xc))
        h = jax.nn.relu(dense(head["fc2"], h))
        pose = pose + dense(head["decpose"], h)
        shape = shape + dense(head["decshape"], h)
        cam = cam + dense(head["deccam"], h)
    rotmats = rot6d_to_rotmat(pose.reshape(B, 24, 6)).reshape(B, 24, 3, 3)
    return hmr_lib.HMROutput(rotmats=rotmats, shape=shape, cam=cam,
                             pose6d=pose)


def forward_folded(folded: dict, images: jnp.ndarray,
                   mean_params: Optional[np.ndarray] = None,
                   n_iter: int = 3) -> hmr_lib.HMROutput:
    """f32 reference path on folded params (tests pin == hmr.apply)."""
    if mean_params is None:
        mean_params = hmr_lib.default_mean_params()
    xf = _backbone_f32(folded, images.astype(jnp.float32))
    return _ief_head(folded["head"], xf, mean_params, n_iter)


def calibrate(folded: dict, images: jnp.ndarray) -> Dict[str, float]:
    """Per-conv-input absolute maxima over a calibration batch -> scales."""
    maxes: Dict[str, float] = {}

    def observe(name, x):
        maxes[name] = max(maxes.get(name, 0.0),
                          float(jnp.max(jnp.abs(x))))

    _backbone_f32(folded, jnp.asarray(images, jnp.float32),
                  observe=observe)
    return {k: max(v, 1e-8) / 127.0 for k, v in maxes.items()}


def quantize(folded: dict, scales: Dict[str, float]) -> dict:
    """Folded f32 params + activation scales -> int8 QConv pytree."""
    def q(fc: FoldedConv, name) -> QConv:
        s_w = jnp.maximum(jnp.max(jnp.abs(fc.w), axis=(0, 1, 2)),
                          1e-12) / 127.0
        wq = jnp.clip(jnp.round(fc.w / s_w), -127, 127).astype(jnp.int8)
        return QConv(w=wq, w_scale=s_w.astype(jnp.float32),
                     b=fc.b.astype(jnp.float32),
                     x_scale=jnp.asarray(scales[name], jnp.float32),
                     strides=fc.strides, padding=fc.padding)

    blocks = []
    for i, stage in enumerate(folded["blocks"]):
        qstage = []
        for j, blk in enumerate(stage):
            name = f"l{i}_{j}"
            qblk = {"conv1": q(blk["conv1"], name + ".c1"),
                    "conv2": q(blk["conv2"], name + ".c2"),
                    "conv3": q(blk["conv3"], name + ".c3")}
            if "down" in blk:
                qblk["down"] = q(blk["down"], name + ".dn")
            qstage.append(qblk)
        blocks.append(qstage)
    return {"stem": q(folded["stem"], "stem"), "blocks": blocks,
            "head": folded["head"]}


def _qconv_apply(qc: QConv, x: jnp.ndarray) -> jnp.ndarray:
    """Quantize input per-tensor, int8 conv with int32 accumulation,
    dequantize into the f32 epilogue."""
    xq = jnp.clip(jnp.round(x / qc.x_scale), -127.0, 127.0).astype(jnp.int8)
    acc = _conv(xq, qc.w, qc.strides, qc.padding, prefer=jnp.int32)
    return (acc.astype(jnp.float32) * (qc.x_scale * qc.w_scale)[None, None,
                                                                None, :]
            + qc.b)


def forward(qparams: dict, images: jnp.ndarray,
            mean_params: Optional[np.ndarray] = None,
            n_iter: int = 3) -> hmr_lib.HMROutput:
    """int8 inference forward: images (B, H, W, 3) -> HMROutput."""
    if mean_params is None:
        mean_params = hmr_lib.default_mean_params()
    x = images.astype(jnp.float32)
    x = jax.nn.relu(_qconv_apply(qparams["stem"], x))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    for stage in qparams["blocks"]:
        for blk in stage:
            y = jax.nn.relu(_qconv_apply(blk["conv1"], x))
            y = jax.nn.relu(_qconv_apply(blk["conv2"], y))
            y = _qconv_apply(blk["conv3"], y)
            res = _qconv_apply(blk["down"], x) if "down" in blk else x
            x = jax.nn.relu(y + res)
    xf = jnp.mean(x, axis=(1, 2))
    return _ief_head(qparams["head"], xf, mean_params, n_iter)


def quantize_hmr(variables: dict, calib_images: jnp.ndarray) -> dict:
    """One-call PTQ: Flax HMR variables + calibration images -> int8
    params for :func:`forward`."""
    folded = fold_batchnorm(variables)
    scales = calibrate(folded, calib_images)
    return quantize(folded, scales)
