"""K-scan decomposition of the fused-raster BINNING phase.

Round-4 history: the DENSE binning measured 174 ms/frame on the 471k-face
production avatar (keys 6 / sort 6 / fidx 22 / rows 8.5 / asm ~140 — the
(T, cap) row gather + table assembly at 82% padding waste dominated),
which motivated the CSR chunk-list rewrite.  This decomposes the CSR
_bin_fused into its sub-phases, each as a lax.scan of K iterations in one
compiled program:

  keys    — bbox -> tile-slot key enumeration (F*M keys)
  sort    — lax.sort_key_val over the F*M slot keys
  chunks  — segment counts + chunk list (ct / fcount / fidx)
  rows    — per-face coefficient rows (_fused_rows)
  asm     — rows[fidx] gather + per-slot constants + table assembly
            (everything downstream of fidx in _bin_fused)

Usage: python tools/kscan_bin.py [--avatar PKL] [--K 4] [--size 1024]
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
    r.block_until_ready()
    t0 = time.perf_counter()
    r = run()
    r.block_until_ready()
    return (time.perf_counter() - t0) / K


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--avatar", default="/tmp/tpubody_bench_video/or_recover.pkl")
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpubody.mesh import rigging
    from tpubody.render import pallas_raster as PR
    from tpubody.render import raster as raster_lib
    from tpubody.render import video as V

    av = rigging.load_avatar(args.avatar)
    verts = np.asarray(av.v_template, np.float32)
    faces = np.asarray(av.faces, np.int32)
    colors = np.full((verts.shape[0], 3), 0.7, np.float32)
    H = W = args.size
    cam_t = (0.0, 0.0, 2.5)
    plan = V.plan_tiled_render(verts, faces, cam_t, H, W)
    fj = jnp.asarray(plan["small_faces"])
    MAXC, sx, sy = plan["total_chunks"], plan["span_x"], plan["span_y"]

    # Screen verts + attrs (colors+normals, like the video path).
    pre_rot = jnp.asarray(V._PRE_ROT.T, jnp.float32)
    flip = jnp.asarray(V._FLIP_YZ.T, jnp.float32)
    vj = jnp.asarray(verts)

    @jax.jit
    def prep(v):
        vv = v @ pre_rot
        vv = (vv + jnp.asarray(cam_t, jnp.float32)) @ flip
        z = jnp.maximum(-vv[..., 2:3], 1e-6)
        x = vv[..., 0:1] / z * V.DEFAULT_FOCAL + W / 2.0
        y = -vv[..., 1:2] / z * V.DEFAULT_FOCAL + H / 2.0
        screen = jnp.concatenate([x, y, z], axis=-1)
        normals = raster_lib.vertex_normals(vv, jnp.asarray(faces))
        return screen, normals

    screen, normals = prep(vj)
    attrs = jnp.concatenate([jnp.asarray(colors), normals], axis=-1)
    F = int(fj.shape[0])
    C = int(attrs.shape[1])
    TILE_W, TILE_H = PR.TILE_W, PR.TILE_H
    TX, TY = W // TILE_W, H // TILE_H
    T = TX * TY
    M = sx * sy
    CF = PR.CF_FUSED
    out = {"F": F, "M": M, "MAXC": MAXC, "C": C}

    def keys_of(s):
        xy = s[:, :2]
        tri = fj
        p0, p1, p2 = xy[tri[:, 0]], xy[tri[:, 1]], xy[tri[:, 2]]
        bmin = jnp.minimum(jnp.minimum(p0, p1), p2)
        bmax = jnp.maximum(jnp.maximum(p0, p1), p2)
        onscreen = ((bmax[:, 0] >= 0) & (bmin[:, 0] < W)
                    & (bmax[:, 1] >= 0) & (bmin[:, 1] < H))
        tx0 = jnp.clip(jnp.floor(bmin[:, 0]).astype(jnp.int32) // TILE_W,
                       0, TX - 1)
        tx1 = jnp.clip(jnp.floor(bmax[:, 0]).astype(jnp.int32) // TILE_W,
                       0, TX - 1)
        ty0 = jnp.clip(jnp.floor(bmin[:, 1]).astype(jnp.int32) // TILE_H,
                       0, TY - 1)
        ty1 = jnp.clip(jnp.floor(bmax[:, 1]).astype(jnp.int32) // TILE_H,
                       0, TY - 1)
        dx = jnp.arange(sx, dtype=jnp.int32)
        dy = jnp.arange(sy, dtype=jnp.int32)
        txs = tx0[:, None] + dx[None]
        tys = ty0[:, None] + dy[None]
        tid = (tys[:, :, None] * TX + txs[:, None, :])
        slot_ok = (onscreen[:, None, None]
                   & (tys <= ty1[:, None])[:, :, None]
                   & (txs <= tx1[:, None])[:, None, :])
        keys = jnp.where(slot_ok, tid, T).reshape(F * M)
        fids = jnp.broadcast_to(
            jnp.arange(F, dtype=jnp.int32)[:, None], (F, M)).reshape(F * M)
        return keys, fids

    dt = timed(lambda s: keys_of(s)[0], screen, K=args.K)
    out["keys_ms"] = round(dt * 1e3, 1)
    print("keys", out["keys_ms"], "ms", file=sys.stderr, flush=True)

    keys, fids = jax.jit(keys_of)(screen)

    dt = timed(lambda k, f: jax.lax.sort_key_val(k, f), keys, fids, K=args.K)
    out["sort_ms"] = round(dt * 1e3, 1)
    print("sort", out["sort_ms"], "ms", file=sys.stderr, flush=True)

    keys_s, fids_s = jax.jit(jax.lax.sort_key_val)(keys, fids)

    def chunks_of(ks, fs):
        seg = jnp.searchsorted(ks, jnp.arange(T + 1, dtype=jnp.int32))
        counts = seg[1:] - seg[:-1]
        nch = jnp.maximum((counts + CF - 1) // CF, 1)
        cum = jnp.cumsum(nch)
        nvalid = cum[-1].astype(jnp.int32)
        starts = cum - nch
        cidx = jnp.arange(MAXC, dtype=jnp.int32)
        ct = jnp.minimum(
            jnp.searchsorted(cum, cidx, side="right").astype(jnp.int32),
            T - 1)
        k = cidx - starts[ct]
        fcount = jnp.where(cidx < nvalid,
                           jnp.clip(counts[ct] - k * CF, 0, CF), 0)
        slot0 = jnp.clip(seg[ct] + k * CF, 0, F * M - 1)
        j = jnp.arange(CF, dtype=jnp.int32)
        slot = jnp.clip(slot0[:, None] + j[None], 0, F * M - 1)
        fidx = jnp.where(j[None] < fcount[:, None], fs[slot], F)
        return fidx, ct, nvalid

    dt = timed(chunks_of, keys_s, fids_s, K=args.K)
    out["chunks_ms"] = round(dt * 1e3, 1)
    print("chunks", out["chunks_ms"], "ms", file=sys.stderr, flush=True)

    dt = timed(lambda s, a: PR._fused_rows(s, fj, a, H, W)[0],
               screen, attrs, K=args.K)
    out["rows_ms"] = round(dt * 1e3, 1)
    print("rows", out["rows_ms"], "ms", file=sys.stderr, flush=True)

    dt = timed(lambda s, a: PR._bin_fused(s, fj, a, H, W, MAXC, sx, sy)[0],
               screen, attrs, K=args.K)
    out["bin_full_ms"] = round(dt * 1e3, 1)
    out["asm_ms"] = round(out["bin_full_ms"] - out["keys_ms"]
                          - out["sort_ms"] - out["chunks_ms"], 1)
    print("bin full", out["bin_full_ms"], "ms (asm ~",
          out["asm_ms"], "ms)", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "kscan_bin_production", "size": args.size,
                      **out}))


if __name__ == "__main__":
    main()
