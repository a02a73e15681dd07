"""HMR: ResNet-50 encoder + iterative-error-feedback SMPL regressor (Flax).

Capability parity with the reference torch model (models/hmr.py:8-164):
input 224x224 RGB -> (pred_rotmat (B,24,3,3), pred_shape (B,10),
pred_cam (B,3)) via a ResNet-50 backbone, global average pool, and a 3-step
IEF loop over an MLP head initialised from SMPL mean parameters.

TPU-first design decisions (not a torch translation):
  * NHWC layout throughout — XLA's preferred conv layout on TPU (MXU tiling).
  * The IEF loop is unrolled statically inside one jit: 3 iterations of a
    small MLP, fused by XLA into the same program as the backbone.
  * Parameter dtype is configurable; bfloat16 activations keep the conv/matmul
    pipeline on the MXU at full rate, with fp32 head outputs for the
    rot6d->rotmat Gram-Schmidt (tpubody.core.rotations.rot6d_to_rotmat).
  * BatchNorm runs in inference mode by default (use_running_average=True),
    matching deployment; training mode is available via ``train=True``.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpubody.core.rotations import rot6d_to_rotmat

NPOSE = 24 * 6  # 144: 24 joints x 6D rotation (reference models/hmr.py:56)


class HMROutput(NamedTuple):
    rotmats: jnp.ndarray  # (B, 24, 3, 3)
    shape: jnp.ndarray    # (B, 10)
    cam: jnp.ndarray      # (B, 3) weak-perspective (s, tx, ty)
    pose6d: jnp.ndarray   # (B, 144) raw 6D pose (pre-Gram-Schmidt)


class Bottleneck(nn.Module):
    """ResNet-v1 bottleneck block, NHWC."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = functools.partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype)
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)

        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=((1, 1), (1, 1)), name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class _Conv1Kernel(nn.Module):
    """Declares the stem's (7,7,3,64) kernel at the ``conv1/kernel`` param
    path (identical to ``nn.Conv(name="conv1")``), independent of which stem
    computation consumes it."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64), jnp.float32)


class ResNet50(nn.Module):
    """ResNet-50 feature extractor -> (B, 2048) pooled features.

    ``stem`` selects how the 7x7/stride-2 input convolution is computed:

    * ``"conv7"`` (default) — direct lax convolution on the (B,224,224,3)
      input.  Measured on one v5e at B=512 bf16 this is the faster choice:
      XLA's TPU conv emitter handles the 3-channel stem well (full backbone
      ~42 ms, ~96 TFLOP/s, ~49% of chip peak).
    * ``"s2d"`` — space-to-depth: RGB is zero-padded to 4 channels and 2x2
      pixel blocks fold into channels ((B,112,112,16)), then an equivalent
      4x4/stride-1 convolution reproduces the exact same outputs (the MLPerf
      ResNet TPU trick).  On the current toolchain this measures ~5% slower
      end-to-end than conv7 (the full-input reshuffle costs more than the
      narrow-channel conv saves), so it is an option, not the default.  The
      parameter stays the canonical (7,7,3,64) kernel — the rearrangement
      happens in-graph, so torch checkpoint conversion and stem choice are
      independent.

    Both stems are numerically equivalent (same math, same params); tests
    pin their agreement.
    """

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stem: str = "conv7"
    # Rematerialize bottleneck blocks on the backward pass: activations
    # inside each block are recomputed instead of stored, trading ~1/3
    # extra forward FLOPs for O(depth) less live activation memory —
    # the standard lever for larger training batches per chip
    # (jax.checkpoint; HBM is the binding constraint, SURVEY.md §7).
    remat: bool = False

    def _stem_s2d(self, x, kernel):
        """Space-to-depth stem.  out[i,j] = sum_u,v x[2i+u-3, 2j+v-3] w[u,v]
        with rows r=2p+a (block p, parity a): p = i-2+P for kernel tap
        P in [0,4), so u = 2P+a-1 (tap (P,a)=(0,0) falls outside the 7x7
        kernel and carries zero weight)."""
        B, H, W, _ = x.shape
        OH, OW = H // 2, W // 2
        # (7,7,3,64) -> zero-pad rows/cols so index (2P+a)-1 maps into an
        # (8,8) grid, channels 3->4 -> (4,2,4,2,4,64).
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 1), (0, 0)))
        k8 = k8.reshape(4, 2, 4, 2, 4, 64)
        # -> (P,Q,a,b,c,64) -> (4,4,16,64) matching the s2d channel order.
        k4 = k8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 16, 64)

        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
        xb = xp.reshape(B, OH, 2, OW, 2, 4)
        y = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, OH, OW, 16)
        return jax.lax.conv_general_dilated(
            y, k4.astype(y.dtype), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = functools.partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype)
        # The stem kernel is declared once, at the same param path nn.Conv
        # would use (backbone/conv1/kernel), so torch-converted checkpoints
        # load identically for either stem.
        x = x.astype(self.dtype)
        kernel = _Conv1Kernel(name="conv1")()
        if (self.stem == "s2d" and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0):
            x = self._stem_s2d(x, kernel.astype(self.dtype))
        else:
            x = jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # train selects program structure (BN mode) — static under remat.
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)
        for i, (n_blocks, feats) in enumerate(
                zip(self.stage_sizes, (64, 128, 256, 512))):
            for j in range(n_blocks):
                strides = 2 if (j == 0 and i > 0) else 1
                x = block_cls(feats, strides=strides, dtype=self.dtype,
                              name=f"layer{i + 1}_{j}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)


class HMR(nn.Module):
    """HMR regressor.  ``mean_params``: (144 + 10 + 3,) initial estimate."""

    mean_params: np.ndarray
    n_iter: int = 3
    dtype: Any = jnp.float32
    stem: str = "conv7"
    remat: bool = False   # see ResNet50.remat

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> HMROutput:
        """images: (B, 224, 224, 3) NHWC, normalized."""
        B = images.shape[0]
        xf = ResNet50(dtype=self.dtype, stem=self.stem, remat=self.remat,
                      name="backbone")(images.astype(self.dtype),
                                       train=train)

        mean = jnp.asarray(self.mean_params, jnp.float32)
        pose = jnp.broadcast_to(mean[:NPOSE], (B, NPOSE))
        shape = jnp.broadcast_to(mean[NPOSE:NPOSE + 10], (B, 10))
        cam = jnp.broadcast_to(mean[NPOSE + 10:NPOSE + 13], (B, 3))

        fc1 = nn.Dense(1024, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(1024, dtype=self.dtype, name="fc2")
        # Heads in fp32: small, parity-critical outputs.
        decpose = nn.Dense(NPOSE, dtype=jnp.float32, name="decpose")
        decshape = nn.Dense(10, dtype=jnp.float32, name="decshape")
        deccam = nn.Dense(3, dtype=jnp.float32, name="deccam")
        dropout = nn.Dropout(0.5, deterministic=not train)

        # IEF: statically unrolled (reference models/hmr.py:140-148).
        for _ in range(self.n_iter):
            xc = jnp.concatenate(
                [xf, pose.astype(xf.dtype), shape.astype(xf.dtype),
                 cam.astype(xf.dtype)], axis=-1)
            h = dropout(nn.relu(fc1(xc)))
            h = dropout(nn.relu(fc2(h)))
            h32 = h.astype(jnp.float32)
            pose = pose + decpose(h32)
            shape = shape + decshape(h32)
            cam = cam + deccam(h32)

        rotmats = rot6d_to_rotmat(pose.reshape(B, 24, 6)).reshape(B, 24, 3, 3)
        return HMROutput(rotmats=rotmats, shape=shape, cam=cam, pose6d=pose)


def default_mean_params(seed: int = 0) -> np.ndarray:
    """Deterministic stand-in for the reference's ``smpl_mean_params.npz``
    (stripped asset): identity 6D rotations for all joints, zero shape,
    unit-scale camera — a sane IEF starting point."""
    del seed
    ident6d = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
    shape = np.zeros(10, np.float32)
    cam = np.array([0.9, 0.0, 0.0], np.float32)
    return np.concatenate([ident6d, shape, cam])


def load_mean_params(path: str) -> np.ndarray:
    """Load the reference mean-params npz (keys pose (144,), shape (10,),
    cam (3,); reference models/hmr.py:103-107)."""
    z = np.load(path)
    return np.concatenate([
        np.asarray(z["pose"], np.float32).reshape(-1),
        np.asarray(z["shape"], np.float32).reshape(-1),
        np.asarray(z["cam"], np.float32).reshape(-1),
    ])


def create_hmr(
    mean_params: Optional[np.ndarray] = None,
    n_iter: int = 3,
    dtype: Any = jnp.bfloat16,
    rng: Optional[jax.Array] = None,
    image_size: int = 224,
    stem: str = "conv7",
    init: str = "real",
) -> Tuple[HMR, Any]:
    """Build an HMR module + initialized variables.

    ``init="shape"`` materializes the variable tree without compiling the
    forward program (utils.flaxtools.shape_init) — use it when the
    variables are about to be replaced by a checkpoint, or in tests where
    only structure/plausibility matters; ResNet-50 init otherwise costs
    ~25 s of XLA:CPU compile on a 1-core host.
    """
    if mean_params is None:
        mean_params = default_mean_params()
    model = HMR(mean_params=mean_params, n_iter=n_iter, dtype=dtype,
                stem=stem)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, image_size, image_size, 3))
    if init == "shape":
        from tpubody.utils.flaxtools import shape_init

        variables = shape_init(model, example, rng=rng)
    else:
        variables = model.init(rng, example)
    return model, variables


def convert_torch_state_dict(state_dict: dict, mean_params: np.ndarray,
                             n_iter: int = 3) -> dict:
    """Convert a reference torch HMR checkpoint into Flax variables.

    Accepts a ``{name: numpy array}`` mapping with torchvision-style resnet
    naming as used by the reference (models/hmr.py:49-111): ``conv1.weight``,
    ``bn1.*``, ``layer{1..4}.{j}.conv{1..3}.weight``, ``.bn{1..3}.*``,
    ``.downsample.0/1.*``, ``fc1/fc2/decpose/decshape/deccam.{weight,bias}``.
    Torch OIHW conv kernels become HWIO; Dense weights are transposed.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv_w(name):
        return np.transpose(sd[name], (2, 3, 1, 0))  # OIHW -> HWIO

    def bn(dst_scope, src):
        put(params, dst_scope + ("scale",), sd[src + ".weight"])
        put(params, dst_scope + ("bias",), sd[src + ".bias"])
        put(batch_stats, dst_scope + ("mean",), sd[src + ".running_mean"])
        put(batch_stats, dst_scope + ("var",), sd[src + ".running_var"])

    bb = ("backbone",)
    put(params, bb + ("conv1", "kernel"), conv_w("conv1.weight"))
    bn(bb + ("bn1",), "bn1")
    for i, n_blocks in enumerate((3, 4, 6, 3)):
        for j in range(n_blocks):
            src = f"layer{i + 1}.{j}"
            dst = bb + (f"layer{i + 1}_{j}",)
            for c in (1, 2, 3):
                put(params, dst + (f"conv{c}", "kernel"),
                    conv_w(f"{src}.conv{c}.weight"))
                bn(dst + (f"bn{c}",), f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                put(params, dst + ("downsample_conv", "kernel"),
                    conv_w(f"{src}.downsample.0.weight"))
                bn(dst + ("downsample_bn",), f"{src}.downsample.1")
    for name in ("fc1", "fc2", "decpose", "decshape", "deccam"):
        put(params, (name, "kernel"), sd[f"{name}.weight"].T)
        put(params, (name, "bias"), sd[f"{name}.bias"])
    return {"params": params, "batch_stats": batch_stats}
