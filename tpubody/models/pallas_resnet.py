"""Fused residual-stage Pallas kernels for ResNet inference (HMR backbone).

Why: K-scan attribution (tools/kscan_hmr.py, docs/STATUS.md round-3 table)
shows the HMR flagship step is dominated by ResNet-50's EARLY stages, and
those are HBM-bandwidth-bound, not MXU-bound — at 56x56 every bottleneck
block round-trips its 822 MB (batch 512, bf16) activation tensor to HBM
three times plus two 205 MB intermediates (measured: layer1 8.7 GB/batch at
532 GB/s = 16.3 ms).  XLA cannot fuse across conv boundaries, but one
image's ENTIRE stage fits in VMEM (layer1 ~12 MB of ~16 MB/core), so a
per-image kernel that runs the whole block chain on-chip eliminates every
intermediate HBM trip: traffic drops to one input read + one output write.

Design (TPU-first, no reference counterpart — the reference runs torchvision
ResNet, models/hmr.py:49-111):

  * CHANNEL-MAJOR layout (C, P): matmuls put pixels on MXU lanes (P is
    large) and channels on sublanes, so narrow-channel stages (C=64) don't
    waste the 128-wide lane dimension the way NHWC conv emitters do.
  * The spatial grid is padded by a 1-pixel zero ring and flattened:
    P_grid = (H+2)*(W+2), lane-padded to a multiple of 128.  A 3x3 conv
    tap (dy, dx) is then a pure COLUMN SHIFT by (dy-1)*(W+2)+(dx-1):
    im2col = 9 circular rolls, concatenated on the sublane axis -> ONE
    (C_mid, 9*C_mid) x (9*C_mid, P) matmul with a full 128+ contraction.
    Roll wrap-around only ever lands in ring/pad columns, which are
    re-zeroed by a mask multiply after every block (exactness proof in
    tests: interior reads stay in-range because |shift| <= W+3).
  * BatchNorm (inference) is folded into the conv weights and a per-channel
    bias on the host side (exact algebra, same as models/hmr_quant.py) —
    the kernel computes conv -> bias -> relu in f32 accumulation and
    rounds to bf16 between matmuls, like the XLA bf16 path.
  * Grid = (B,): one image per step; weights ride as whole-array blocks.

NOT wired into models/hmr.py: measured at production shapes
(tools/bench_fused_stage.py, docs/STATUS.md round-3 table) the fused
kernel wins only on layer1 (+6%) and loses 2x on layer2 — the im2col
rolls are VPU work that replaces HBM time XLA already overlaps with MXU
compute.  Kept in-tree as a measured experiment; parity with the Flax
Bottleneck stage is pinned in tests/test_pallas_resnet.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16
BN_EPS = 1e-5  # flax.linen.BatchNorm epsilon used by models/hmr.py


@flax.struct.dataclass
class FusedStage:
    """BN-folded weights of one residual stage in kernel layout.

    Block 0 may change width (C_in -> C_out) through a downsample 1x1;
    blocks 1..n-1 are uniform (C_out -> C_out).  All A matrices are
    (rows=out_channels, cols=contraction) bf16; biases are (C, 1) f32.
    ``n_rest`` is static metadata (not a pytree leaf).
    """

    A1_0: jnp.ndarray    # (C_mid, C_in)
    b1_0: jnp.ndarray
    A2_0: jnp.ndarray    # (C_mid, 9*C_mid)
    b2_0: jnp.ndarray
    A3_0: jnp.ndarray    # (C_out, C_mid)
    b3_0: jnp.ndarray
    Ad: Optional[jnp.ndarray]    # (C_out, C_in) or None (identity residual)
    bd: Optional[jnp.ndarray]
    A1_r: jnp.ndarray    # (max(n-1,1), C_mid, C_out)
    b1_r: jnp.ndarray
    A2_r: jnp.ndarray    # (max(n-1,1), C_mid, 9*C_mid)
    b2_r: jnp.ndarray
    A3_r: jnp.ndarray    # (max(n-1,1), C_out, C_mid)
    b3_r: jnp.ndarray
    n_rest: int = flax.struct.field(pytree_node=False, default=0)


def _fold_bn(kernel, scale, bias, mean, var):
    """Fold inference BatchNorm into a conv kernel + per-channel bias
    (exact: y = g*(conv(x) - m) + b with g = scale/sqrt(var+eps))."""
    g = np.asarray(scale, np.float64) / np.sqrt(
        np.asarray(var, np.float64) + BN_EPS)
    kf = np.asarray(kernel, np.float64) * g  # broadcasts over O (last dim)
    bf = np.asarray(bias, np.float64) - np.asarray(mean, np.float64) * g
    return kf, bf


def _block_mats(bparams, bstats):
    """One Bottleneck's (conv{1,2,3}+bn{1,2,3} [+downsample]) -> kernel
    matrices.  Tap order in A2 columns is (dy, dx) row-major, matching the
    kernel's roll offsets."""
    def fold(conv, bn):
        return _fold_bn(bparams[conv]["kernel"], bparams[bn]["scale"],
                        bparams[bn]["bias"], bstats[bn]["mean"],
                        bstats[bn]["var"])

    k1, b1 = fold("conv1", "bn1")
    k2, b2 = fold("conv2", "bn2")
    k3, b3 = fold("conv3", "bn3")
    A1 = k1[0, 0].T                                   # (C_mid, C_in)
    c_mid = A1.shape[0]
    A2 = np.transpose(k2, (3, 0, 1, 2)).reshape(c_mid, 9 * c_mid)
    A3 = k3[0, 0].T
    out = dict(A1=A1, b1=b1, A2=A2, b2=b2, A3=A3, b3=b3)
    if "downsample_conv" in bparams:
        kd, bd = fold("downsample_conv", "downsample_bn")
        out["Ad"] = kd[0, 0].T
        out["bd"] = bd
    return out


def fuse_stage(backbone_params, backbone_stats, stage: int,
               blocks: Sequence[int]) -> FusedStage:
    """Build FusedStage from the Flax backbone variable trees.

    ``stage`` is 1-based (layer1..layer4); ``blocks`` the block indices to
    fuse (must be contiguous; block ``blocks[0]`` may carry the
    downsample, later ones must not)."""
    mats = []
    for j in blocks:
        name = f"layer{stage}_{j}"
        mats.append(_block_mats(backbone_params[name],
                                backbone_stats[name]))
    first, rest = mats[0], mats[1:]
    if any("Ad" in m for m in rest):
        raise ValueError("only the first fused block may downsample")

    def jb(x):
        return jnp.asarray(np.asarray(x), BF16)

    def jbias(x):
        return jnp.asarray(np.asarray(x, np.float32).reshape(-1, 1), F32)

    c_mid = first["A1"].shape[0]
    c_out = first["A3"].shape[0]
    rest_shapes = {"A1": (c_mid, c_out), "A2": (c_mid, 9 * c_mid),
                   "A3": (c_out, c_mid), "b1": (c_mid, 1),
                   "b2": (c_mid, 1), "b3": (c_out, 1)}

    def stack(key, cast):
        if not rest:
            # One zero block keeps shapes static; n_rest=0 means the
            # kernel never reads it.
            return jnp.zeros((1,) + rest_shapes[key],
                             BF16 if key[0] == "A" else F32)
        return jnp.stack([cast(m[key]) for m in rest])

    return FusedStage(
        A1_0=jb(first["A1"]), b1_0=jbias(first["b1"]),
        A2_0=jb(first["A2"]), b2_0=jbias(first["b2"]),
        A3_0=jb(first["A3"]), b3_0=jbias(first["b3"]),
        Ad=jb(first["Ad"]) if "Ad" in first else None,
        bd=jbias(first["bd"]) if "bd" in first else None,
        A1_r=stack("A1", jb), b1_r=stack("b1", jbias),
        A2_r=stack("A2", jb), b2_r=stack("b2", jbias),
        A3_r=stack("A3", jb), b3_r=stack("b3", jbias),
        n_rest=len(rest),
    )


def _stage_kernel(x_ref, mask_ref,
                  a1_0, b1_0, a2_0, b2_0, a3_0, b3_0,
                  a1_r, b1_r, a2_r, b2_r, a3_r, b3_r,
                  ad_ref, bd_ref,
                  out_ref, *, offsets: Tuple[int, ...], n_rest: int,
                  has_down: bool):
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=F32)
    mask = mask_ref[:]                      # (1, P) bf16 {0, 1}

    def conv3x3(h_bf16, A, b):
        # pltpu.roll wants non-negative shifts; (-off) % P is the same
        # circular shift.  This toolchain's Mosaic rejects sub-32-bit
        # rotates ("Rotate with non-32-bit data"), so the (C, P) bf16
        # block rolls as its PACKED (C/2, P) i32 view — a lane roll moves
        # every row by the same shift, so the channel pairing is
        # preserved exactly (pinned on chip: bitcast-roll == jnp.roll).
        # Halves the roll traffic vs f32 rolls and feeds the MXU concat
        # without a per-tap cast.  Wrap-around only ever lands in
        # ring/pad columns (|off| <= W+3 < ring width at the array
        # seam), which the h1 mask has already zeroed.
        p = h_bf16.shape[1]
        hi = pltpu.bitcast(h_bf16, jnp.int32)
        cols = jnp.concatenate(
            [pltpu.bitcast(pltpu.roll(hi, (-off) % p, 1), BF16)
             for off in offsets], axis=0)
        return jax.nn.relu(dot(A, cols) + b)

    def block(x_bf16, A1, b1, A2, b2, A3, b3, res_f32):
        # Only h1 needs masking: it is the sole input the rolls mix
        # across columns.  The 1x1 convs (A1, A3) and the residual add
        # are columnwise, so ring/pad garbage in y never reaches an
        # interior column of any later block; the host slices the
        # interior off the final output.
        h1 = (jax.nn.relu(dot(A1, x_bf16) + b1).astype(BF16) * mask)
        h2 = conv3x3(h1, A2, b2).astype(BF16)
        y = dot(A3, h2) + b3 + res_f32
        return jax.nn.relu(y).astype(BF16)

    x = x_ref[0]                            # (C_in, P) bf16
    if has_down:
        res = dot(ad_ref[:], x) + bd_ref[:]
    else:
        res = x.astype(F32)
    y = block(x, a1_0[:], b1_0[:], a2_0[:], b2_0[:], a3_0[:], b3_0[:], res)
    for j in range(n_rest):
        y = block(y, a1_r[j], b1_r[j], a2_r[j], b2_r[j],
                  a3_r[j], b3_r[j], y.astype(F32))
    out_ref[0] = y


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "n_rest", "has_down", "interpret"))
def _run_fused(xf, mask, stage: FusedStage, height: int, width: int,
               n_rest: int, has_down: bool, interpret: bool):
    B, C_in, P = xf.shape
    C_out = int(stage.A3_0.shape[0])
    ad = stage.Ad if has_down else jnp.zeros((C_out, C_in), BF16)
    bd = stage.bd if has_down else jnp.zeros((C_out, 1), F32)

    wpx = width + 2
    offsets = tuple((dy - 1) * wpx + (dx - 1)
                    for dy in range(3) for dx in range(3))
    kernel = functools.partial(
        _stage_kernel, offsets=offsets, n_rest=n_rest, has_down=has_down)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim)

    operands = [mask, stage.A1_0, stage.b1_0, stage.A2_0, stage.b2_0,
                stage.A3_0, stage.b3_0, stage.A1_r, stage.b1_r,
                stage.A2_r, stage.b2_r, stage.A3_r, stage.b3_r, ad, bd]
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C_in, P), lambda b: (b, 0, 0))]
        + [whole(a) for a in operands],
        out_specs=pl.BlockSpec((1, C_out, P), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C_out, P), BF16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xf, *operands)


def run_stage(x_nhwc: jnp.ndarray, stage: FusedStage,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """Apply a fused residual stage: (B, H, W, C_in) -> (B, H, W, C_out).

    Stride-1 blocks only (a strided first block must stay on the XLA path;
    models/hmr.py routes accordingly)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C_in = map(int, x_nhwc.shape)
    n_rest = stage.n_rest
    has_down = stage.Ad is not None
    if int(stage.A1_0.shape[0]) % 2:
        raise ValueError("C_mid must be even (packed bf16 rolls)")

    p_grid = (H + 2) * (W + 2)
    P = -(-p_grid // 128) * 128

    xc = jnp.transpose(x_nhwc.astype(BF16), (0, 3, 1, 2))
    xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (1, 1)))
    xf = xp.reshape(B, C_in, p_grid)
    if P != p_grid:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, P - p_grid)))

    cols = np.arange(P)
    r, c = cols // (W + 2), cols % (W + 2)
    interior = ((cols < p_grid) & (r >= 1) & (r <= H) & (c >= 1)
                & (c <= W))
    mask = jnp.asarray(interior.astype(np.float32)[None], BF16)

    out = _run_fused(xf, mask, stage, H, W, n_rest, has_down,
                     interpret)
    C_out = out.shape[1]
    y = out[:, :, :p_grid].reshape(B, C_out, H + 2, W + 2)[:, :, 1:-1, 1:-1]
    return jnp.transpose(y, (0, 2, 3, 1))
