"""Quality delta of the default hole-fill switch: pyramid vs diffusion.

Round 4 made ``warp_stage(fill="pyramid")`` the production default (an
O(log n) pull-push fill replacing the up-to-512-pass masked-diffusion
fixed point; reference semantics replaced: lib/Warp.py:354-456) without
recording what the switch does to the reconstruction output.  This tool
runs the REAL downstream pipeline twice on the test01 1024^2 fixture —
warp -> normal2depth -> stitch — changing ONLY the fill, and reports:

  * warped-value-map delta on the filled (hole) pixels,
  * front/back depth-map delta inside the mask,
  * stitched-mesh vertex-position delta (same topology: the mesh is a
    function of the mask, which the fill does not change).

Usage: python tools/compare_fill.py [--fixture .../test01]
Prints ONE JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import _cache  # noqa: E402

_cache.enable()

import numpy as np  # noqa: E402

DEFAULT_FIXTURE = "/root/reference/data/tests/test01"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default=DEFAULT_FIXTURE)
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpubody.image import warp as warp_lib
    from tpubody.mesh import stitch as stitch_lib
    from tpubody.models import params as params_lib
    from tpubody.models import smpl as smpl_lib
    from tpubody.pipelines import reconstruct as rec
    from tpubody.render import bodymaps
    from tpubody.solve import normal2depth as n2d

    front, back, mask, fit = rec.load_test_dir(args.fixture)
    smplh = params_lib.load_or_synthetic("smplh", n_joints=52)
    smpl = params_lib.load_or_synthetic("smpl", n_joints=24)
    H, W = np.asarray(mask).shape

    from tpubody.render import camera as camera_lib

    pose_h = fit.pose.reshape(-1, 3)[:smplh.num_joints]
    state = smpl_lib.forward(smplh, jnp.asarray(pose_h, jnp.float32),
                             jnp.asarray(fit.shape, jnp.float32))
    value = bodymaps.render_body_maps(
        np.asarray(state.verts, np.float64), smplh.faces,
        np.asarray(smpl.weights), fit.camera_translation,
        fit.camera_center, H, W, focal=fit.camera_fx).value

    state_b = smpl_lib.forward(smpl, jnp.asarray(pose_h[:24], jnp.float32),
                               jnp.asarray(fit.shape, jnp.float32))
    K = camera_lib.Intrinsics.make(fit.camera_fx, fit.camera_fx,
                                   fit.camera_center[0],
                                   fit.camera_center[1])
    J_2d = np.asarray(camera_lib.project_points(
        jnp.asarray(np.asarray(smpl_lib.regress_joints(
            smpl, state_b.verts)), jnp.float32), K,
        jnp.asarray(fit.camera_rotation, jnp.float32),
        jnp.asarray(fit.camera_translation, jnp.float32)))
    J_2d = np.clip(np.round(J_2d), 0, [W - 1, H - 1]).astype(int)

    m = np.asarray(mask) > 0
    results = {}
    for fill in ("pyramid", "diffusion"):
        wres = warp_lib.warp_stage(np.asarray(mask), value, fill=fill)
        fd, bd = n2d.normal2depth(wres.value[..., :6], jnp.asarray(m))
        sres = stitch_lib.stitch_mesh(
            np.asarray(fd), np.asarray(front, np.float32)[..., :3],
            np.asarray(bd), np.asarray(back, np.float32)[..., :3],
            np.asarray(wres.value[..., 6:]), J_2d)
        results[fill] = dict(
            warped=np.asarray(wres.value), raw=np.asarray(wres.warped_raw),
            fd=np.asarray(fd), bd=np.asarray(bd),
            points=np.asarray(sres.points))

    p, d = results["pyramid"], results["diffusion"]
    holes = m & (np.abs(d["raw"]).sum(-1) == 0)     # pixels the fill wrote
    wd = np.abs(p["warped"] - d["warped"])
    depth_d = np.abs(np.stack([p["fd"] - d["fd"], p["bd"] - d["bd"]]))[
        :, m]
    vmatch = p["points"].shape == d["points"].shape
    vert_d = (np.linalg.norm(
        p["points"][:, :3] - d["points"][:, :3], axis=1)
        if vmatch else None)
    body_h = float(np.ptp(np.flatnonzero(m.any(1))))  # mask height, px

    print(json.dumps({
        "metric": "fill_switch_delta_pyramid_vs_diffusion",
        "fixture": os.path.basename(args.fixture),
        "size": [int(H), int(W)],
        "hole_px": int(holes.sum()),
        "value_delta_on_holes": {
            "mean": round(float(wd[holes].mean()), 5),
            "p99": round(float(np.quantile(wd[holes], 0.99)), 5),
        },
        "depth_delta_px": {
            "mean": round(float(depth_d.mean()), 5),
            "p99": round(float(np.quantile(depth_d, 0.99)), 5),
        },
        "mesh_topology_identical": bool(vmatch),
        "vertex_delta_frac_of_body_height": {
            "mean": round(float(vert_d.mean() / body_h), 6),
            "max": round(float(vert_d.max() / body_h), 6),
        } if vmatch else None,
    }))


if __name__ == "__main__":
    main()
