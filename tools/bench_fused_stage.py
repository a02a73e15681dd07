"""Measure the fused residual-stage Pallas kernel vs the XLA stage path.

K-scan style (anti-hoist carry, scan of K inside one executable) at the
production HMR shapes.  Baselines from tools/kscan_hmr.py round 3:
layer1 16.34 ms, layer2 13.14 ms (B=512 bf16, one v5e); the stage-2
numbers here cover only its stride-1 tail (blocks 1-3 — block 0 is
stride-2 and stays on the XLA path).

Measured verdict (2026-08-19, one v5e, packed-bf16 rolls, compile cache
on): stage 1 fused 15.3 ms vs 16.33 XLA (+6%); stage 2 fused 16.26 ms vs
8.33 XLA (2x SLOWER).  The kernel meets its HBM goal (one read + one
write) but the im2col rolls make it VPU-bound, and XLA's conv emitter
already overlaps HBM traffic with MXU work — see docs/STATUS.md round-3
ceiling analysis.  The fused path stays an experiment (not wired into
models/hmr.py).

Usage: python tools/bench_fused_stage.py [--stage 1] [--batch 512] [--k 8]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from tpubody.models import pallas_resnet as PR
from tpubody.models.hmr import Bottleneck


class Blocks(nn.Module):
    """Stride-1 bottleneck chain named like a ResNet50 stage slice."""

    stage: int
    block_ids: tuple
    feats: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for j in self.block_ids:
            x = Bottleneck(self.feats, strides=1, dtype=self.dtype,
                           name=f"layer{self.stage}_{j}")(x, False)
        return x


def kscan_time(fn, x, k, reps=3):
    @jax.jit
    def prog(x):
        def body(c, _):
            y = fn(x * (1 + c * jnp.asarray(1e-6, x.dtype)))
            return jnp.mean(y.astype(jnp.float32)).astype(x.dtype), None
        c, _ = jax.lax.scan(body, jnp.asarray(0, x.dtype), None, length=k)
        return c

    prog(x).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        prog(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1, choices=(1, 2))
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--what", default="both",
                    choices=("both", "fused", "xla", "parity"))
    ap.add_argument("--blocks", type=int, default=0,
                    help="fuse only the first N blocks (0 = whole chain); "
                         "isolates Mosaic compile-time scaling")
    args = ap.parse_args()
    B, K = args.batch, args.k

    cache_dir = os.environ.get("TPUBODY_COMPILE_CACHE")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if args.stage == 1:
        block_ids, feats, hw, c_in = (0, 1, 2), 64, 56, 64
    else:
        block_ids, feats, hw, c_in = (1, 2, 3), 128, 28, 512
    if args.blocks:
        block_ids = block_ids[:args.blocks]

    import time as _t
    print(f"[{_t.strftime('%H:%M:%S')}] init blocks={block_ids} "
          f"hw={hw} c_in={c_in}", flush=True)
    mod = Blocks(stage=args.stage, block_ids=block_ids, feats=feats)
    rng = np.random.default_rng(0)
    example = jnp.zeros((1, hw, hw, c_in), jnp.bfloat16)
    vs = mod.init(jax.random.PRNGKey(0), example)
    # Nonzero bounded weights (pure timing + parity; keeps the chain
    # finite and stops XLA constant-folding).
    leaves, treedef = jax.tree_util.tree_flatten(vs)
    leaves = [jnp.asarray(rng.uniform(0.02, 0.1, np.shape(l)), l.dtype)
              for l in leaves]
    vs = jax.tree_util.tree_unflatten(treedef, leaves)

    fused = PR.fuse_stage(vs["params"], vs["batch_stats"], args.stage,
                          list(block_ids))

    def xla_blocks(x):
        return mod.apply(vs, x)

    x_in = jnp.asarray(
        rng.normal(size=(B, hw, hw, c_in)).astype(np.float32), jnp.bfloat16)

    results = {}
    if args.what in ("both", "parity"):
        xs = x_in[:2]
        print(f"[{time.strftime('%H:%M:%S')}] parity: xla fwd...", flush=True)
        y_ref = np.asarray(xla_blocks(xs), np.float32)
        print(f"[{time.strftime('%H:%M:%S')}] parity: pallas fwd (Mosaic "
              "compile)...", flush=True)
        y = np.asarray(PR.run_stage(xs, fused), np.float32)
        rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        results["parity_rel_err"] = float(rel)
        print("parity rel err:", rel, flush=True)

    if args.what in ("both", "fused"):
        ms = kscan_time(lambda x: PR.run_stage(x, fused), x_in, K) * 1e3
        results["fused_ms"] = round(ms, 2)
        print("fused", json.dumps({"ms": results["fused_ms"]}), flush=True)

    if args.what in ("both", "xla"):
        ms = kscan_time(xla_blocks, x_in, K) * 1e3
        results["xla_ms"] = round(ms, 2)
        print("xla", json.dumps({"ms": results["xla_ms"]}), flush=True)

    print(json.dumps({"stage": args.stage, "batch": B, **results}))


if __name__ == "__main__":
    main()
