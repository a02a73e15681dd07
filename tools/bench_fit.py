"""Production batched-SMPLify throughput benchmark (one chip).

Usage: python tools/bench_fit.py [N] [verts] [--smpl] [--sequence]

``--sequence`` benchmarks video fitting instead: a smooth synthetic
keypoint trajectory of N frames through chained fit_sequence (each warm
frame runs the truncated config.warm_maxiters budget through the same
compiled program) vs the same frames through the stills path (full
budget), reporting ms/frame and mean final loss for both — the VERDICT
round-3 "warm-started frames should need a fraction" measurement.

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

from tools import _cache  # noqa: E402

_cache.enable()

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

    if "--sequence" in sys.argv:
        block = 1
        for i, a in enumerate(sys.argv):
            if a == "--block":
                if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
                    sys.exit("usage: --block N (positive integer)")
                block = int(sys.argv[i + 1])
        # Smooth trajectory: a base skeleton drifting frame to frame.
        r = np.random.default_rng(3)
        base = kps_batch(1, 1)[0]
        drift = np.cumsum(1.5 * r.normal(size=(N, 1, 2)), axis=0)
        seq = np.repeat(base[None], N, axis=0)
        seq[..., :2] += drift + 0.8 * r.normal(size=(N, n_kp, 2))

        t0 = time.time()
        warm_out = smplify.fit_sequence(model, seq, center, cfg,
                                        chained=True, block=block)
        t_chain_cold = time.time() - t0
        t0 = time.time()
        warm_out = smplify.fit_sequence(model, seq, center, cfg,
                                        chained=True, block=block)
        t_chain = time.time() - t0

        t0 = time.time()
        stills_out = smplify.fit_frames(model, seq, center, cfg)
        t_still_cold = time.time() - t0
        t0 = time.time()
        stills_out = smplify.fit_frames(model, seq, center, cfg)
        t_still = time.time() - t0
        print(json.dumps({
            "mode": "sequence", "model": "smpl" if smpl else "smplh",
            "T": N, "verts": verts, "block": block,
            "warm_maxiters": cfg.warm_maxiters,
            "chained_ms_per_frame": round(t_chain / N * 1000, 1),
            "stills_ms_per_frame": round(t_still / N * 1000, 1),
            "speedup": round(t_still / t_chain, 2),
            "chained_mean_loss": round(float(np.mean(warm_out.loss)), 2),
            "stills_mean_loss": round(float(np.mean(stills_out.loss)), 2),
            "cold_s": {"chained": round(t_chain_cold, 1),
                       "stills": round(t_still_cold, 1)},
        }))
        return

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
