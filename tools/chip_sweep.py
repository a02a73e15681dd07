"""One-shot on-chip verification sweep (run via the axon tunnel).

Runs, in order, with per-stage timing and a JSON line per stage:
  1. probe     — tiny op, confirms the tunnel is alive
  2. oracle    — SMPL LBS vs the float64 numpy oracle on the chip
  3. bench     — the flagship bench.py path (inline, batch ladder)
  4. animate   — reconstructed-avatar AMASS animation through the tiled
                 renderer (the 42k over-span-face memory-bound path), if a
                 recover pickle exists at --avatar
  5. int8      — int8 PTQ vs bf16 backbone comparison (tools/bench_int8.py
                 methodology, smaller iters)

Stages are independent: a failure records {"ok": false} and the sweep
continues.  Usage: python tools/chip_sweep.py [--avatar PKL] [--skip ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage(name):
    def deco(fn):
        fn._stage_name = name
        return fn
    return deco


@_stage("probe")
def probe():
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    assert dev.platform != "cpu", f"not a chip: {dev}"
    val = float(jnp.ones((256, 256)).sum())
    return {"device": str(dev), "val": val}


@_stage("oracle")
def oracle():
    import jax.numpy as jnp
    import numpy as np

    from tpubody.models import params, smpl
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from oracle.np_body import lbs_np

    model = params.synthetic(n_joints=24, n_verts=6890, seed=0)
    rng = np.random.default_rng(0)
    poses = jnp.asarray(rng.normal(scale=0.3, size=(64, 24, 3)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(10,)), jnp.float32)
    out = smpl.forward_batch(model, poses, beta, None)
    out.verts.block_until_ready()
    raw = params.synthetic_numpy(n_joints=24, n_verts=6890, seed=0)
    ref = lbs_np(raw, np.asarray(poses[0]), np.asarray(beta), np.zeros(3))
    err = float(np.abs(
        np.asarray(smpl.forward(model, poses[0], beta).verts)
        - ref["verts"]).max())
    assert err < 1e-4, err
    return {"max_vert_err": err}


@_stage("bench")
def bench():
    import subprocess
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")],
        capture_output=True, text=True, timeout=1800)
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    out = {"rc": r.returncode}
    try:
        out["result"] = json.loads(line)
    except Exception:
        out["stdout_tail"] = line[-300:]
        out["stderr_tail"] = r.stderr[-500:]
    return out


@_stage("animate")
def animate(avatar_path, amass_path):
    import numpy as np

    from tpubody.io import motion as motion_lib
    from tpubody.mesh import rigging
    from tpubody.pipelines import animate as animate_lib

    avatar = rigging.load_avatar(avatar_path)
    clip = motion_lib.read_amass(amass_path, stride=4)
    t0 = time.time()
    mp4 = animate_lib.animate_video(
        avatar, clip, "/tmp/chip_sweep_amass.mp4",
        cam_t=np.asarray([0.0, 0.0, 2.5]), size=1024)
    return {"frames": int(clip.poses.shape[0]),
            "seconds": round(time.time() - t0, 1),
            "mp4_bytes": os.path.getsize(mp4),
            "faces": int(avatar.faces.shape[0])}


@_stage("int8")
def int8(batch=256, iters=10):
    import subprocess
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "bench_int8.py"),
         str(batch), "224", str(iters)],
        capture_output=True, text=True, timeout=1800)
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    out = {"rc": r.returncode}
    try:
        out["results"] = [json.loads(ln) for ln in lines]
    except Exception:
        out["stdout_tail"] = r.stdout[-300:]
    if r.returncode:
        out["stderr_tail"] = r.stderr[-500:]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--avatar", default="/tmp/test03_out/replace_hands_recover.pkl")
    ap.add_argument("--amass",
                    default="/root/reference/data/amsass/09_05_poses.npz")
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()

    stages = [
        ("probe", probe, ()),
        ("oracle", oracle, ()),
        ("bench", bench, ()),
        ("animate", animate, (args.avatar, args.amass)),
        ("int8", int8, ()),
    ]
    for name, fn, fargs in stages:
        if name in args.skip:
            continue
        if name == "animate" and not os.path.exists(args.avatar):
            print(json.dumps({"stage": name, "ok": False,
                              "skipped": "no avatar pickle"}), flush=True)
            continue
        t0 = time.time()
        try:
            res = fn(*fargs)
            print(json.dumps({"stage": name, "ok": True,
                              "seconds": round(time.time() - t0, 1),
                              **res}), flush=True)
        except Exception as e:
            traceback.print_exc()
            print(json.dumps({"stage": name, "ok": False,
                              "seconds": round(time.time() - t0, 1),
                              "error": repr(e)[:300]}), flush=True)
            if name == "probe":
                sys.exit(2)   # tunnel dead; nothing else can run


if __name__ == "__main__":
    main()
