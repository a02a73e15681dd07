"""Per-stage K-scan attribution of the flagship HMR step on the real chip.

The axon tunnel's ~30 ms dispatch floor makes per-call micro-timings garbage
(.claude/skills/verify/SKILL.md), so each stage group is measured by scanning
it K times INSIDE one executable, with the scan carry perturbing the input so
XLA cannot hoist the loop-invariant computation out of the scan.  Per-group
time = program time / K; compute-bound groups scale ~linearly in K (checked
by measuring at K and 2K).

Stage groups (ResNet-50, reference math models/hmr.py:113-152):
  stem   conv1 7x7/2 + BN + relu + maxpool 3x3/2   (B,224,224,3)->(B,56,56,64)
  layer1 3 bottlenecks @ 56x56x256
  layer2 4 bottlenecks @ 28x28x512
  layer3 6 bottlenecks @ 14x14x1024
  layer4 3 bottlenecks @ 7x7x2048
  head   global pool + 3-step IEF MLP + rot6d->rotmat
  lbs    fused Pallas LBS, 6890 verts

Usage: python tools/kscan_hmr.py [--batch 512] [--k 8]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpubody.models import hmr as hmr_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib
from tpubody.models.hmr import Bottleneck, _Conv1Kernel


class Stem(nn.Module):
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        kernel = _Conv1Kernel(name="conv1")()
        x = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="bn1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class Stage(nn.Module):
    stage_idx: int  # 0-based
    n_blocks: int
    feats: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for j in range(self.n_blocks):
            strides = 2 if (j == 0 and self.stage_idx > 0) else 1
            x = Bottleneck(self.feats, strides=strides, dtype=self.dtype,
                           name=f"layer{self.stage_idx + 1}_{j}")(x, False)
        return x


def kscan_time(fn, x, k: int, reps: int = 3) -> float:
    """Seconds per single application of fn, measured as a scan of k inside
    one executable (anti-hoist: input scaled by a carry-dependent factor)."""

    @jax.jit
    def prog(x):
        def body(c, _):
            y = fn(x * (1 + c * jnp.asarray(1e-6, x.dtype)))
            return jnp.mean(y.astype(jnp.float32)).astype(x.dtype), None
        c, _ = jax.lax.scan(body, jnp.asarray(0, x.dtype), None, length=k)
        return c

    prog(x).block_until_ready()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        prog(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--groups", default="all",
                    help="comma list from stem,layer1..layer4,backbone,step")
    ap.add_argument("--check-linearity", action="store_true",
                    help="also measure at 2K and report the ratio")
    args = ap.parse_args()
    B, K = args.batch, args.k
    want = (None if args.groups == "all"
            else set(args.groups.split(",")))

    cache_dir = os.environ.get("TPUBODY_COMPILE_CACHE")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    # shape_init + host-side random fill: timing doesn't need trained
    # weights (the real init costs another on-chip compile through the
    # tunnel), but they MUST be nonzero — zero conv kernels let XLA
    # constant-fold the whole network away (measured: "0.0 ms").
    model, variables = hmr_lib.create_hmr(dtype=jnp.bfloat16, init="shape")
    fill = np.random.default_rng(1)

    def randomize(x):
        a = np.asarray(fill.uniform(0.5, 1.5, np.shape(x)), x.dtype)
        return jnp.asarray(a)

    variables = jax.tree.map(randomize, variables)
    bvars = {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"]["backbone"]}
    body = params_lib.synthetic(n_joints=24, n_verts=6890, seed=0)
    rng = np.random.default_rng(0)

    groups = []
    stem = Stem()
    groups.append(("stem", lambda x: stem.apply(bvars, x),
                   (B, 224, 224, 3)))
    chans = (64, 256, 512, 1024)
    hw = (56, 56, 28, 14)
    for i, (n_blocks, feats) in enumerate(zip((3, 4, 6, 3),
                                              (64, 128, 256, 512))):
        stage = Stage(stage_idx=i, n_blocks=n_blocks, feats=feats)
        groups.append((f"layer{i + 1}",
                       functools.partial(stage.apply, bvars),
                       (B, hw[i], hw[i], chans[i])))

    results = {}
    for name, fn, shape in groups:
        if want is not None and name not in want:
            continue
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32),
                        jnp.bfloat16)
        ms = kscan_time(fn, x, K) * 1e3
        line = {"ms": round(ms, 2)}
        if args.check_linearity:
            ms2 = kscan_time(fn, x, 2 * K) * 1e3
            line["ms_at_2k"] = round(ms2, 2)
        results[name] = line
        print(name, json.dumps(line), flush=True)

    # Full backbone (stem+4 stages) via the real module path; the IEF head
    # + LBS cost is the difference full_step - backbone_full.
    if want is None or "backbone" in want:
        full_bb = hmr_lib.ResNet50(dtype=jnp.bfloat16, name="backbone")

        def bb_fn(x):
            return full_bb.apply(
                {"params": bvars["params"],
                 "batch_stats": bvars["batch_stats"]}, x)
        x_img = jnp.asarray(
            rng.normal(size=(B, 224, 224, 3)).astype(np.float32),
            jnp.bfloat16)
        ms_bb = kscan_time(bb_fn, x_img, K) * 1e3
        results["backbone_full"] = {"ms": round(ms_bb, 2)}
        print("backbone_full", json.dumps(results["backbone_full"]),
              flush=True)

    # Full flagship step (HMR + LBS) — should match bench.py per-batch time.
    if want is None or "step" in want:
        def step_fn(images):
            out = model.apply(variables, images)
            verts = smpl_lib.forward_batch_verts(
                body, out.rotmats, out.shape, None,
                use_pallas=jax.default_backend() == "tpu",
                pose_is_rotmat=True)
            return verts
        x32 = jnp.asarray(
            rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
        ms_step = kscan_time(step_fn, x32, K) * 1e3
        results["full_step"] = {"ms": round(ms_step, 2)}
        print("full_step", json.dumps(results["full_step"]), flush=True)

    print(json.dumps({"batch": B, "k": K, "per_group": results}))


if __name__ == "__main__":
    main()
