"""Measure int8 PTQ HMR inference vs the bf16 flagship (one chip).

Usage: python tools/bench_int8.py [batch]

Prints one JSON line per path (bf16 baseline, int8) with the same
pipelined methodology as bench.py so the numbers are comparable.
If the int8 convolutions do not lower efficiently on the current
toolchain, expect parity or a slowdown — the result is recorded either
way (models/hmr_quant.py stays opt-in experimental until int8 wins).
"""
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 224
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
DEPTH = 4


def timed(step, images):
    jax.block_until_ready(step(images))  # compile
    jax.block_until_ready(step(images))
    q: deque = deque()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        q.append(step(images))
        if len(q) > DEPTH:
            jax.block_until_ready(q.popleft())
    while q:
        jax.block_until_ready(q.popleft())
    return BATCH * ITERS / (time.perf_counter() - t0)


def main():
    from tpubody.models import hmr as hmr_lib
    from tpubody.models import hmr_quant as hq
    from tpubody.models import params as params_lib
    from tpubody.models import smpl as smpl_lib

    body = params_lib.synthetic(n_joints=24, n_verts=6890, seed=0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(BATCH, SIZE, SIZE, 3)).astype(np.float32))
    use_pallas = jax.default_backend() == "tpu"

    model, variables = hmr_lib.create_hmr(dtype=jnp.bfloat16,
                                          image_size=SIZE)

    @jax.jit
    def step_bf16(imgs):
        out = model.apply(variables, imgs)
        return smpl_lib.forward_batch_verts(
            body, out.rotmats, out.shape, None,
            use_pallas=use_pallas, pose_is_rotmat=True), out.cam

    fps = timed(step_bf16, images)
    print(json.dumps({"path": "bf16", "batch": BATCH,
                      "fps": round(fps, 1)}))

    # f32 variables for folding (bf16 BN stats fold fine but keep f32 math).
    model32, vars32 = hmr_lib.create_hmr(dtype=jnp.float32, image_size=SIZE)
    qp = hq.quantize_hmr(vars32, images[:8])

    @jax.jit
    def step_int8(imgs):
        out = hq.forward(qp, imgs)
        return smpl_lib.forward_batch_verts(
            body, out.rotmats, out.shape, None,
            use_pallas=use_pallas, pose_is_rotmat=True), out.cam

    fps_q = timed(step_int8, images)
    print(json.dumps({"path": "int8", "batch": BATCH,
                      "fps": round(fps_q, 1),
                      "speedup_vs_bf16": round(fps_q / fps, 3)}))


if __name__ == "__main__":
    main()
