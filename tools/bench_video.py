"""BASELINE config-5 end-to-end bench: production avatar + AMASS clip -> MP4.

Measures the full clip->video path (tpubody.pipelines.animate.animate_video:
batched skinning, fused tiled Pallas rasterization incl. the over-span face
ladder, host H.264 mux) on a PRODUCTION-scale avatar — by default the one
reconstructed from the reference's test03_1024 fixture (the mesh whose ~42k
over-span faces used to force the fragment fallback).  The reference's
counterpart is a serial per-frame Open3D render loop muxed at 30/60 fps
(lib/model2video.py:514-523,553) — realtime output rate, not throughput.

The avatar is built once (pipelines.reconstruct on the fixture, synthetic
body models) and cached under --workdir; subsequent runs reuse it.

Usage: python tools/bench_video.py [--frames 64] [--size 1024]
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

DEFAULT_FIXTURE = "/root/reference/data/tests/test03_1024"
DEFAULT_CLIP = "/root/reference/data/amsass/09_05_poses.npz"


def build_avatar(fixture: str, workdir: str):
    """Reconstruct (or load the cached) production avatar."""
    from tpubody.mesh import rigging
    from tpubody.models import params as params_lib
    from tpubody.pipelines import reconstruct as rec

    pkl = os.path.join(workdir, "or_recover.pkl")
    if os.path.exists(pkl):
        return rigging.load_avatar(pkl)
    front, back, mask, fit = rec.load_test_dir(fixture)
    smplh = params_lib.load_or_synthetic("smplh", n_joints=52)
    smpl = params_lib.load_or_synthetic("smpl", n_joints=24)
    res = rec.reconstruct(front, back, mask, fit, smplh, smpl,
                          out_dir=workdir, cache=True)
    return res.avatar


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default=DEFAULT_FIXTURE)
    ap.add_argument("--clip", default=DEFAULT_CLIP)
    ap.add_argument("--avatar", default=None,
                    help="skip reconstruction; load this avatar pickle")
    ap.add_argument("--workdir", default="/tmp/tpubody_bench_video")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--lod", type=int, default=None,
                    help="decimate the avatar to ~N verts before "
                         "rendering (quality/speed knob)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from tpubody.io import motion as motion_lib
    from tpubody.mesh import rigging
    from tpubody.pipelines import animate as animate_lib

    if args.avatar:
        avatar = rigging.load_avatar(args.avatar)
    else:
        t0 = time.perf_counter()
        avatar = build_avatar(args.fixture, args.workdir)
        print(f"avatar ready in {time.perf_counter() - t0:.1f}s "
              f"({avatar.v_template.shape[0]} verts, "
              f"{avatar.faces.shape[0]} faces)", file=sys.stderr, flush=True)
    if args.lod:
        # LOD is avatar PREP (once per avatar, like the reconstruction
        # itself), not per-clip work: decimate outside the timed passes.
        from tpubody.mesh import decimate as decimate_lib

        avatar = decimate_lib.decimate_avatar(avatar, target_verts=args.lod)
        print(f"lod avatar: {avatar.v_template.shape[0]} verts, "
              f"{avatar.faces.shape[0]} faces", file=sys.stderr, flush=True)

    clip = motion_lib.read_amass(args.clip)
    n = min(args.frames, clip.poses.shape[0])
    clip = motion_lib.MotionClip(poses=clip.poses[:n], trans=clip.trans[:n],
                                 fps=clip.fps)

    out = os.path.join(args.workdir, "bench.mp4")
    # Warm pass 0 (compiles), then the measured pass.
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        animate_lib.animate_video(avatar, clip, out, size=args.size,
                                  chunk=args.chunk)
        dt = time.perf_counter() - t0
        fps = n / dt
        print(f"{label}: {n} frames in {dt:.2f}s = {fps:.2f} fps",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "clip_to_mp4_fps_production_avatar",
        "value": round(fps, 2),
        "unit": f"frames/sec at {args.size}^2 (incl. skinning+mux)",
        "frames": n,
        "lod": args.lod,
        "avatar_faces": int(avatar.faces.shape[0]),
        "vs_reference_playback": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
