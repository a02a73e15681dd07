"""Production batched-SMPLify throughput benchmark (one chip).

Usage: python tools/bench_fit.py [N] [verts] [--smpl]

Measures the full 5-stage reference schedule (maxiters=30, both
orientation candidates, VPoser parameterization with a random decoder —
architecture cost, not fit quality) at production scale: cold compile
once, then warm ms/frame over fresh keypoints.  Prints one JSON line.
Baseline on one v5e (2026-08-19, reduced-vertex fit): N=8, 6890-vert
SMPLH -> cold 136 s, warm 0.99 s = 123 ms/frame; N=64 -> cold 153 s,
warm 4.26 s = 66.6 ms/frame.  (Full-vertex forward, reduce_verts=False:
356 ms/frame at N=8, 253 ms/frame at N=64.)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    N = int(args[0]) if len(args) > 0 else 8
    verts = int(args[1]) if len(args) > 1 else 6890
    smpl = "--smpl" in sys.argv

    from tpubody.fit import smplify
    from tpubody.models import params as params_lib

    nj = 24 if smpl else 52
    model = params_lib.synthetic(n_joints=nj, n_verts=verts, seed=0)
    cfg = smplify.FitConfig(model_type="smpl" if smpl else "smplh")
    n_kp = 25 if smpl else 67

    def kps_batch(n, seed):
        r = np.random.default_rng(seed)
        k = np.zeros((n, n_kp, 3), np.float32)
        k[..., :2] = 500 + 80 * r.normal(size=(n, n_kp, 2))
        k[..., 2] = 1.0
        return k

    center = np.array([512.0, 512.0])
    t0 = time.time()
    smplify.fit_frames(model, kps_batch(N, 1), center, cfg)
    t_cold = time.time() - t0
    t0 = time.time()
    out = smplify.fit_frames(model, kps_batch(N, 2), center, cfg)
    t_warm = time.time() - t0
    print(json.dumps({
        "model": "smpl" if smpl else "smplh",
        "N": N, "verts": verts,
        "stages": len(cfg.body_pose_prior_weights),
        "maxiters": cfg.maxiters,
        "cold_s": round(t_cold, 1), "warm_s": round(t_warm, 2),
        "ms_per_frame": round(t_warm / N * 1000, 1),
        "losses_finite": bool(np.isfinite(out.loss).all()),
    }))


if __name__ == "__main__":
    main()
