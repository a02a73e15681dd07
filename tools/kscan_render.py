"""K-scan phase attribution for the production-avatar tiled render.

Decomposes one 1024^2 frame render of a production reconstructed avatar
(471k faces) into: vertex transform+normals, face binning (_bin_fused),
the fused Pallas kernel given a prebuilt table, and the full
render_frames_tiled step.  Each phase is timed as a lax.scan of K
iterations inside ONE compiled program (the only trustworthy timing mode
through the device tunnel — see .claude/skills/verify/SKILL.md), with
outputs reduced to a checksum that stays on device.

Usage: python tools/kscan_render.py [--avatar PKL] [--K 4] [--size 1024]
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

import numpy as np


def timed(fn, *args, K: int):
    """Compile fn as a K-iteration scan, return (sec_per_iter, checksum)."""
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
        return carry + s, None

    @jax.jit
    def run():
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return acc

    r = run()
    r.block_until_ready()           # compile + warm
    t0 = time.perf_counter()
    r = run()
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    return dt, float(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--avatar", default="/tmp/tpubody_bench_video/or_recover.pkl")
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--lod", type=int, default=None,
                    help="decimate to ~N verts before planning (matches "
                         "bench_video --lod)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpubody.mesh import rigging
    from tpubody.render import pallas_raster as PR
    from tpubody.render import raster as raster_lib
    from tpubody.render import video as V

    av = rigging.load_avatar(args.avatar)
    if args.lod:
        from tpubody.mesh import decimate as decimate_lib

        av = decimate_lib.decimate_avatar(av, target_verts=args.lod)
    verts = np.asarray(av.v_template, np.float32)
    faces = np.asarray(av.faces, np.int32)
    colors = np.asarray(av.colors[:, :3], np.float32) if getattr(
        av, "colors", None) is not None else np.full(
            (verts.shape[0], 3), 0.7, np.float32)
    H = W = args.size
    cam_t = (0.0, 0.0, 2.5)

    plan = V.plan_tiled_render(verts, faces, cam_t, H, W)
    print(f"plan: small={plan['small_faces'].shape[0]} "
          f"total_chunks={plan['total_chunks']} "
          f"span=({plan['span_x']},{plan['span_y']}) "
          f"ladder={[(f.shape[0], s) for f, s in zip(plan['ladder_faces'], plan['ladder_specs'])]} "
          f"frag={sum(b.shape[0] for b in plan['large_buckets'])}",
          file=sys.stderr, flush=True)

    # Screen-space verts (device), one frame.
    vj = jnp.asarray(verts)[None]
    fj = jnp.asarray(plan["small_faces"])
    cj = jnp.asarray(colors)
    bg = jnp.ones((H, W, 3), jnp.float32)
    cam_tj = jnp.asarray(cam_t, jnp.float32)

    out = {}

    # Phase A: transform + normals (what render_frames_tiled does pre-bin).
    pre_rot = jnp.asarray(V._PRE_ROT.T, jnp.float32)
    flip = jnp.asarray(V._FLIP_YZ.T, jnp.float32)
    all_faces = jnp.asarray(faces)

    def phase_xform(v):
        vv = v @ pre_rot
        vv = (vv + cam_tj) @ flip
        z = jnp.maximum(-vv[..., 2:3], 1e-6)
        x = vv[..., 0:1] / z * V.DEFAULT_FOCAL + W / 2.0
        y = -vv[..., 1:2] / z * V.DEFAULT_FOCAL + H / 2.0
        screen = jnp.concatenate([x, y, z], axis=-1)
        normals = jax.vmap(
            lambda q: raster_lib.vertex_normals(q, all_faces))(vv)
        return screen, normals

    dt, _ = timed(phase_xform, vj, K=args.K)
    out["xform_normals_ms"] = round(dt * 1e3, 1)
    print("xform+normals", out["xform_normals_ms"], "ms",
          file=sys.stderr, flush=True)

    screen, normals = jax.jit(phase_xform)(vj)
    attrs = jnp.concatenate(
        [jnp.broadcast_to(cj, normals[0].shape), normals[0]], axis=-1)

    # Phase B: binning alone (the fused CSR variant).
    def phase_bin(s, a):
        tab, ct, nvalid, overflow, _ = PR._bin_fused(
            s, fj, a, H, W, plan["total_chunks"],
            plan["span_x"], plan["span_y"])
        # Sum the whole table so XLA cannot dead-code-eliminate any of it.
        return nvalid, overflow, jnp.sum(tab), jnp.sum(ct)

    dt, _ = timed(phase_bin, screen[0], attrs, K=args.K)
    out["bin_ms"] = round(dt * 1e3, 1)
    print("bin", out["bin_ms"], "ms", file=sys.stderr, flush=True)

    # Table stats (host-side, informational).
    tab, ct, nvalid, overflow, metas = jax.jit(
        PR._bin_fused, static_argnums=(3, 4, 5, 6, 7))(
            screen[0], fj, attrs, H, W, plan["total_chunks"],
            plan["span_x"], plan["span_y"])
    print("table bytes: %.3f GB; overflow=%d; valid chunks=%d of %d"
          % (tab.size * 4 / 2**30, int(overflow), int(nvalid),
             plan["total_chunks"]),
          file=sys.stderr, flush=True)

    # Phase C: the Pallas kernel alone, on the prebuilt table.
    fb = raster_lib._face_bits(int(fj.shape[0]))
    depth_levels = 1 << (31 - fb)

    def phase_kernel(tb, cs):
        win, attr = PR._fused_call(tb[None], cs[None], H, W, 6, fb,
                                   depth_levels, False)
        return jnp.sum(win), jnp.sum(attr)

    dt, _ = timed(phase_kernel, tab, ct, K=args.K)
    out["kernel_ms"] = round(dt * 1e3, 1)
    print("kernel", out["kernel_ms"], "ms", file=sys.stderr, flush=True)

    # Phase C2: bin + kernel in ONE program, no detile/epilogue — isolates
    # whether fusing bin with the kernel consumer changes XLA's plan.
    def phase_binkernel(s, a):
        tb, cs, nv, ov, _ = PR._bin_fused(
            s, fj, a, H, W, plan["total_chunks"],
            plan["span_x"], plan["span_y"])
        win, at = PR._fused_call(tb[None], cs[None], H, W, 6, fb,
                                 depth_levels, False)
        return jnp.sum(win), jnp.sum(at), nv, ov

    dt, _ = timed(phase_binkernel, screen[0], attrs, K=args.K)
    out["binkernel_ms"] = round(dt * 1e3, 1)
    print("bin+kernel", out["binkernel_ms"], "ms", file=sys.stderr,
          flush=True)

    # Phase D: full fused raster call (bin + kernel + detile);
    # kernel+detile ~= this minus the bin phase.
    def phase_full(s, a):
        attr_img, hit, depth, ov = PR.render_attrs_tiled(
            s[None], fj, a, H, W, span_x=plan["span_x"],
            span_y=plan["span_y"], total_chunks=plan["total_chunks"])
        return jnp.sum(attr_img), jnp.sum(depth * hit)

    dt, _ = timed(phase_full, screen[0], attrs, K=args.K)
    out["raster_full_ms"] = round(dt * 1e3, 1)
    print("raster full", out["raster_full_ms"], "ms",
          file=sys.stderr, flush=True)

    # Phase E: whole-frame production render (base + ladder rungs).
    def phase_frame(v):
        img = V.render_frames_tiled(
            v, fj, None, all_faces, cj, cam_tj, bg, H, W,
            span_x=plan["span_x"], span_y=plan["span_y"],
            total_chunks=plan["total_chunks"],
            ladder_faces=tuple(jnp.asarray(f) for f in plan["ladder_faces"]),
            ladder_specs=plan["ladder_specs"], to_uint8=True,
            channel_major_out=True)
        return jnp.sum(img.astype(jnp.int32))

    dt, _ = timed(phase_frame, vj, K=args.K)
    out["frame_full_ms"] = round(dt * 1e3, 1)
    print("frame full", out["frame_full_ms"], "ms",
          file=sys.stderr, flush=True)

    print(json.dumps({"metric": "kscan_render_production",
                      "size": args.size, "lod": args.lod,
                      "faces": int(faces.shape[0]), **out}))


if __name__ == "__main__":
    main()
