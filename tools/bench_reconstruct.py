"""BASELINE config-4 end-to-end bench: photo fixture -> rigged avatar.

Runs the full reconstruction pipeline (tpubody.pipelines.reconstruct —
reference scope main.py:28-141) on a reference test fixture with
load_or_synthetic body models, stage cache DISABLED, and reports the
per-stage and total wall-clock.  Two passes: cold (includes every XLA
compile) and warm (compiled programs cached in-process) — the warm pass is
the steady-state per-image cost.

The reference has no published number for this path; its pipeline runs the
same stages serially on CPU/GPU with scipy CG (lib/Normal2Depth.py:107-113)
and python-loop mesh stitching (lib/Depth2Mesh_Bspline.py:371-464).

Usage: python tools/bench_reconstruct.py [--fixture .../test01] [--hands]
Prints ONE JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import _cache  # noqa: E402

_cache.enable()

DEFAULT_FIXTURE = "/root/reference/data/tests/test01"


def run_once(front, back, mask, fit, smplh, smpl, replace_hands):
    from tpubody.pipelines import reconstruct as rec
    from tpubody.utils.profiling import StageTimer

    timer = StageTimer()
    t0 = time.perf_counter()
    rec.reconstruct(front, back, mask, fit, smplh, smpl,
                    out_dir=None, replace_hands=replace_hands,
                    cache=False, timer=timer)
    total = time.perf_counter() - t0
    stages = {r["stage"]: r["seconds"] for r in timer.records}
    return total, stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default=DEFAULT_FIXTURE)
    ap.add_argument("--hands", action="store_true",
                    help="include the hand-replacement stage")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from tpubody.models import params as params_lib
    from tpubody.pipelines import reconstruct as rec

    front, back, mask, fit = rec.load_test_dir(args.fixture)
    smplh = params_lib.load_or_synthetic("smplh", n_joints=52)
    smpl = params_lib.load_or_synthetic("smpl", n_joints=24)

    totals, stages = [], {}
    for i in range(args.passes):
        total, st = run_once(front, back, mask, fit, smplh, smpl, args.hands)
        totals.append(total)
        stages = st
        print(f"pass {i}: {total:.2f}s "
              + " ".join(f"{k}={v:.2f}" for k, v in st.items()),
              file=sys.stderr, flush=True)

    warm = totals[-1]
    print(json.dumps({
        "metric": "reconstruct_e2e_seconds_per_image",
        "value": round(warm, 3),
        "unit": "s (warm; cold incl. compiles: %.1fs)" % totals[0],
        "fixture": os.path.basename(args.fixture),
        "size": list(mask.shape),
        "stages": {k: round(v, 3) for k, v in stages.items()},
    }))


if __name__ == "__main__":
    main()
