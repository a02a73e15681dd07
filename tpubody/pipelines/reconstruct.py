"""End-to-end single-image reconstruction pipeline (reference main.py).

Stages (call stack parity with main.py:28-141, SURVEY.md §3.2):
  1. SMPLH forward at the fitted (shape, pose156) — tpubody.models.smpl,
  2. project SMPL joints to pixels — tpubody.render.camera (JRender math),
  3. render front/back normal + 24-weight value maps — render.bodymaps,
  4. warp the maps into the photo silhouette — image.warp,
  5. integrate normals to front/back depth — solve.normal2depth,
  6. stitch the two depth meshes + recover 3D joints — mesh.stitch,
  7. rig the mesh onto the SMPL skeleton — mesh.rigging.

With ``cache=True`` every stage persists the reference's side-car
artifacts (smplh_value.npy, warp_and_filled.npy, depth_front.npy, ...
main.py:84-122) through the content-addressed StageCache, giving
resumable runs.  With ``cache=False`` the intermediate blocks stay
DEVICE-resident (the 126 MB value block never round-trips the host —
worth ~5 s/image through a remote-device tunnel) and only the final
mesh/avatar artifacts are written.
"""
from __future__ import annotations

import os
import pickle
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from tpubody.image import warp as warp_lib
from tpubody.mesh import meshio, rigging, stitch as stitch_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib
from tpubody.render import bodymaps, camera as camera_lib
from tpubody.solve import normal2depth as n2d
from tpubody.utils.cache import StageCache, digest
from tpubody.utils.profiling import StageTimer


class FitResult(NamedTuple):
    """Contents of the fitting stage's smplh.pkl
    (data/tests/*/smplh.pkl schema, SURVEY.md §4)."""

    shape: np.ndarray              # (10,)
    pose: np.ndarray               # (156,) SMPLH axis-angle (52*3)
    camera_center: np.ndarray      # (2,)
    camera_rotation: np.ndarray    # (3, 3)
    camera_translation: np.ndarray  # (3,)
    camera_fx: float


def load_fit_pickle(path: str) -> FitResult:
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="iso-8859-1")
    return FitResult(
        shape=np.asarray(d["spmlh_shape"], np.float64).reshape(-1)[:10],
        pose=np.asarray(d["spmlh_pose"], np.float64).reshape(-1),
        camera_center=np.asarray(d["camera_center"], np.float64).reshape(2),
        camera_rotation=np.asarray(d["camera_rotation"],
                                   np.float64).reshape(3, 3),
        camera_translation=np.asarray(d["camera_translation"],
                                      np.float64).reshape(3),
        camera_fx=float(np.asarray(d.get("camera_fx", 5000.0)).reshape(-1)[0]),
    )


def save_fit_pickle(path: str, fit: FitResult) -> None:
    with open(path, "wb") as f:
        pickle.dump({
            "spmlh_shape": fit.shape, "spmlh_pose": fit.pose,
            "camera_center": fit.camera_center,
            "camera_rotation": fit.camera_rotation,
            "camera_translation": fit.camera_translation,
            "camera_fx": fit.camera_fx,
        }, f)


class ReconstructResult(NamedTuple):
    avatar: rigging.RiggedAvatar
    points: np.ndarray     # stitched (N, 30) attribute mesh
    faces: np.ndarray
    joints3d: np.ndarray


def reconstruct(
    front_rgb: np.ndarray,        # (H, W, 3) uint8/float
    back_rgb: np.ndarray,
    mask: np.ndarray,             # (H, W) person silhouette
    fit: FitResult,
    smplh_model: params_lib.BodyModelParams,   # 52-joint model
    smpl_model: params_lib.BodyModelParams,    # 24-joint model (weights/J)
    out_dir: Optional[str] = None,
    replace_hands: bool = False,
    cache: bool = True,
    timer: Optional[StageTimer] = None,
) -> ReconstructResult:
    """Run the full reconstruction (main.py:28-141 parity)."""
    timer = timer or StageTimer()
    # TPUBODY_DETAIL=1: substage attribution (adds device syncs + transfer
    # timing; measurement mode only).
    detail = timer if os.environ.get("TPUBODY_DETAIL") else None
    H, W = np.asarray(mask).shape
    sc = StageCache(out_dir, enabled=cache and out_dir is not None) \
        if out_dir else StageCache("/tmp/tpubody_cache", enabled=False)

    pose_h = fit.pose.reshape(-1, 3)
    n_joints_h = smplh_model.num_joints
    pose_h = pose_h[:n_joints_h]
    pose_b = pose_h[:24]

    with timer.stage("smplh_forward"):
        state_h = smpl_lib.forward(
            smplh_model, jnp.asarray(pose_h, jnp.float32),
            jnp.asarray(fit.shape, jnp.float32))
        verts = np.asarray(state_h.verts, np.float64)

        state_b = smpl_lib.forward(
            smpl_model, jnp.asarray(pose_b, jnp.float32),
            jnp.asarray(fit.shape, jnp.float32))

    with timer.stage("project_joints"):
        K = camera_lib.Intrinsics.make(
            fit.camera_fx, fit.camera_fx,
            fit.camera_center[0], fit.camera_center[1])
        J3d_smpl = np.asarray(smpl_lib.regress_joints(
            smpl_model, state_b.verts))
        J_2d = np.asarray(camera_lib.project_points(
            jnp.asarray(J3d_smpl, jnp.float32), K,
            jnp.asarray(fit.camera_rotation, jnp.float32),
            jnp.asarray(fit.camera_translation, jnp.float32)))
        J_2d = np.clip(np.round(J_2d), 0,
                       [W - 1, H - 1]).astype(int)

    with timer.stage("render_value_maps"):
        def _render_dev():
            import contextlib
            with (detail.stage("render/device") if detail
                  else contextlib.nullcontext()):
                v = bodymaps.render_body_maps(
                    verts, smplh_model.faces,
                    np.asarray(smpl_model.weights),
                    fit.camera_translation, fit.camera_center,
                    H, W, focal=fit.camera_fx).value
                if detail:
                    v.block_until_ready()
            return v

        if sc.enabled:
            h_val = digest(verts, smpl_model.weights,
                           fit.camera_translation, fit.camera_center,
                           H=H, W=W)
            maps = sc.run(
                "render", h_val, ["smplh_value.npy"],
                lambda: {"smplh_value.npy": np.asarray(_render_dev())})
            smplh_value = maps["smplh_value.npy"]
        else:
            # Cache off: the 30-channel value block (126 MB at 1024^2)
            # stays DEVICE-resident through warp and normal2depth — the
            # host round trip (pull + re-push) cost ~5 s/image through
            # the remote-device tunnel; it crosses once, before stitch.
            smplh_value = _render_dev()

    with timer.stage("warp"):
        if sc.enabled:
            h_warp = digest(smplh_value, mask)

            def _warp():
                import contextlib
                v = warp_lib.warp_stage(np.asarray(mask), smplh_value,
                                        timer=detail).value
                with (detail.stage("warp/to_host") if detail
                      else contextlib.nullcontext()):
                    return {"warp_and_filled.npy": np.asarray(v)}

            warped = sc.run("warp", h_warp, ["warp_and_filled.npy"], _warp)
            warp_value = warped["warp_and_filled.npy"]
            stitch_weights = warp_value[..., 6:]
            warp_dev = None
        else:
            warp_dev = warp_lib.warp_stage(np.asarray(mask), smplh_value,
                                           timer=detail).value
            warp_value = None

    with timer.stage("normal2depth"):
        if sc.enabled:
            h_n2d = digest(warp_value[..., :6], mask)
            depths = sc.run(
                "normal2depth", h_n2d,
                ["depth_front.npy", "depth_back.npy"],
                lambda: dict(zip(
                    ["depth_front.npy", "depth_back.npy"],
                    [np.asarray(x) for x in n2d.normal2depth(
                        jnp.asarray(warp_value[..., :6], jnp.float32),
                        jnp.asarray(np.asarray(mask) > 0))])))
            front_depth = depths["depth_front.npy"]
            back_depth = depths["depth_back.npy"]
        else:
            import contextlib
            fd, bd = n2d.normal2depth(
                warp_dev[..., :6], jnp.asarray(np.asarray(mask) > 0))
            # The solve is queued async: the one warp pull (stitch input)
            # overlaps it.  Stitch consumes only the 24 weight channels,
            # and blend weights in [0,1] lose nothing that survives the
            # rig stage's renormalization at f16 — so 50 MB crosses the
            # host boundary instead of the full 126 MB f32 block.
            with (detail.stage("warp/to_host") if detail
                  else contextlib.nullcontext()):
                stitch_weights = np.asarray(
                    warp_dev[..., 6:].astype(jnp.float16)).astype(np.float32)
            front_depth = np.asarray(fd)
            back_depth = np.asarray(bd)

    with timer.stage("stitch"):
        fc = np.asarray(front_rgb, np.float32)[..., :3]
        bc = np.asarray(back_rgb, np.float32)[..., :3]
        res = stitch_lib.stitch_mesh(
            front_depth, fc, back_depth, bc,
            stitch_weights, J_2d, timer=detail)
        if out_dir:
            np.save(sc.path("points"), res.points)
            np.save(sc.path("faces"), res.faces)
            np.save(sc.path("J_3d"), res.joints3d)

    with timer.stage("rig"):
        avatar = rigging.rig_mesh(
            smpl_model,
            res.points[:, :3], res.points[:, 3:6], res.faces,
            res.points[:, 6:30], pose_b, fit.shape, res.joints3d)

    if replace_hands:
        with timer.stage("replace_hands"):
            from tpubody.mesh import hands as hands_lib
            avatar = hands_lib.replace_hands(avatar, smpl_model)

    if out_dir:
        with timer.stage("save"):
            rigging.save_avatar(
                sc.path("replace_hands_recover.pkl" if replace_hands
                        else "or_recover.pkl"), avatar)
            meshio.write_ply(sc.path("out.ply"), res.points[:, :3],
                             res.faces, res.points[:, 3:6])
            # Engine-ready skinned export of the rigged avatar alongside
            # the pickle (beyond the reference's PLY/pickle-only surface).
            from tpubody.mesh import gltf as gltf_lib
            gltf_lib.export_avatar_glb(sc.path("out.glb"), avatar)
    return ReconstructResult(avatar=avatar, points=res.points,
                             faces=res.faces, joints3d=res.joints3d)


def load_test_dir(path: str):
    """Load a reference fixture directory (data/tests/testNN layout)."""
    import cv2

    from tpubody.image import ops as img_ops
    front = img_ops.read_image(os.path.join(path, "front_rgb.png"))
    back = img_ops.read_image(os.path.join(path, "back_rgb.png"))
    mask = cv2.imread(os.path.join(path, "mask.png"), cv2.IMREAD_GRAYSCALE)
    if mask is None:
        raise FileNotFoundError(
            f"unreadable image: {os.path.join(path, 'mask.png')}")
    fit = load_fit_pickle(os.path.join(path, "smplh.pkl"))
    return front, back, mask, fit
