"""Animation pipeline: rigged avatar + motion clip -> rendered MP4.

Capability parity with the reference video drivers
(lib/model2video.py:476-604 main_or/View_mesh and
lib/model2video_miaxmo.py:485-599), re-designed for TPU throughput:

  * skinning for ALL frames runs as one batched program
    (core.lbs.skin_batch) instead of a per-frame python loop,
  * frames render in fixed-size chunks through the jitted batch renderer
    (render.video.render_frames) — chunking bounds VMEM while keeping the
    compiled program static-shaped,
  * multi-chip: ``animate_video(..., mesh=...)`` shards the frame axis over
    a ``jax.sharding`` mesh; XLA all-gathers the rendered frames back for
    host-side muxing (ICI traffic only — SURVEY.md §5 "distributed").
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpubody.dist import mesh as mesh_lib
from tpubody.io import motion as motion_lib
from tpubody.mesh import rigging
from tpubody.render import video as video_lib


def animate_video(
    avatar: rigging.RiggedAvatar,
    clip: motion_lib.MotionClip,
    out_path: str,
    background: Optional[np.ndarray] = None,
    cam_t: np.ndarray = (0.0, 0.0, 2.5),
    size: int = video_lib.DEFAULT_SIZE,
    focal: float = video_lib.DEFAULT_FOCAL,
    fps: Optional[float] = None,
    stride: int = 1,
    chunk: int = 8,
    mesh=None,
    window: Optional[int] = None,
    multihost: bool = False,
    lod: Optional[int] = None,
    crop_transfer: bool = True,
    i420_transfer: Optional[bool] = None,
) -> str:
    """Render the avatar driven by the clip into an MP4 at ``out_path``.

    ``multihost=True`` in a ``jax.distributed`` cluster
    (dist.multihost.initialize): each process skins and renders only its
    ``process_frame_slice`` of the clip on its own devices, the rendered
    frames all-gather across processes (DCN on a real pod — exactly the
    SURVEY.md §5 video-assembly collective), and process 0 muxes the MP4.
    Every process returns the out_path; only process 0 writes it.
    """
    if lod:
        # Rendering LOD: reconstructed avatars carry ~2 px triangles at
        # 1024^2 (471k faces for a screen coverage of ~600k px); vertex-
        # cluster decimation trades that oversampling for raster
        # throughput (a quality knob the reference's GPU path lacks).
        from tpubody.mesh import decimate as decimate_lib

        avatar = decimate_lib.decimate_avatar(avatar, target_verts=lod)
    poses = clip.poses[::stride]
    trans = clip.trans[::stride]
    F = poses.shape[0]
    if multihost and jax.process_count() > 1:
        return _animate_video_multihost(
            avatar, poses, trans, out_path, background, cam_t, size,
            focal, fps or (clip.fps / stride), chunk, window)
    # All-frame skinning in one program.
    verts_all = rigging.animate(avatar, poses, trans)

    if mesh is not None:
        verts_all = mesh_lib.shard_frames(verts_all, mesh)

    # Crop-transfer: every body pixel of every frame lies inside the
    # clip's projected vertex bbox (render/video.py::screen_bbox); pulling
    # only that window to host cuts the device->host bytes by the frame
    # coverage ratio — through a remote-chip tunnel the 3 MB/frame
    # full-frame pull, not the render, floors the pipeline (measured
    # ~21 MB/s).  Host pastes the window onto the background canvas.
    crop = None
    if crop_transfer:
        bb = np.asarray(video_lib.screen_bbox(
            verts_all, jnp.asarray(np.asarray(cam_t), jnp.float32),
            size, size, focal))
        x0 = max(int(np.floor(bb[0])) - 4, 0)
        x1 = min(int(np.ceil(bb[1])) + 5, size)
        y0 = max(int(np.floor(bb[2])) - 4, 0)
        y1 = min(int(np.ceil(bb[3])) + 5, size)
        if x1 > x0 and y1 > y0 and (x1 - x0) * (y1 - y0) < 0.7 * size * size:
            crop = (x0, x1, y0, y1)

    # When the body covers most of the frame the crop can't shrink the
    # pull — switch the device output to planar I420 instead: half the
    # bytes per frame AND no host-side channel reorg (the mux converts
    # I420->BGR in one 4 ms cv2 call).  Chroma is 4:2:0-subsampled, which
    # the MP4 codec does anyway — output quality is unchanged.
    # i420_transfer: None = auto (on whenever no crop window is active);
    # False forces the uint8-RGB pull (bit-exact vs the crop path).
    # An active crop window always wins (even over i420_transfer=True):
    # a sub-half-frame RGB crop moves fewer bytes than full-frame I420.
    if i420_transfer is None:
        i420_transfer = crop is None
    render_block, chunk, i420 = _block_renderer(
        avatar, background, cam_t, size, focal, window, chunk,
        i420=(crop is None and i420_transfer))

    canvas = None
    if crop is not None:
        bg = background if background is not None \
            else np.ones((size, size, 3), np.float32)
        canvas = video_lib.quantize_u8(np.asarray(bg, np.float32))

    def pull(dev):
        """Slice the body window on device (when cropping) and pull."""
        if crop is not None:
            x0, x1, y0, y1 = crop
            if dev.ndim == 4 and dev.shape[1] == 3 and dev.shape[-1] != 3:
                dev = dev[:, :, y0:y1, x0:x1]
            else:
                dev = dev[:, y0:y1, x0:x1, :]
            return _to_hwc(np.asarray(dev))
        return np.asarray(dev) if i420 else _to_hwc(np.asarray(dev))

    def emit(frames_np, n):
        for i in range(n):
            f = frames_np[i]
            if crop is not None:
                f = video_lib.quantize_u8(f)
                x0, x1, y0, y1 = crop
                img = canvas.copy()
                img[y0:y1, x0:x1] = f
                writer.write(img)
            elif i420:
                writer.write_i420(f)
            else:
                writer.write(f)

    writer = video_lib.VideoWriter(
        out_path, fps=fps or (clip.fps / stride), size=(size, size))
    with writer:
        # Pipelined dispatch: enqueue the next block's render (async under
        # jax dispatch) before pulling the previous block to host, so the
        # device->host transfer and mux overlap device compute.  The mux
        # itself (cv2 I420->BGR + encode, ~21 ms/frame at 1024^2) runs on
        # a consumer thread: the pull is network-wait through a remote-
        # device tunnel, so encoding overlaps it instead of serializing.
        import queue as queue_lib
        import threading

        q: "queue_lib.Queue" = queue_lib.Queue(maxsize=2)
        mux_err = []

        def mux_worker():
            # Keeps draining after a failure so the producer's q.put can
            # never block on a dead consumer; the error surfaces at join.
            while True:
                item = q.get()
                if item is None:
                    return
                if mux_err:
                    continue
                try:
                    emit(*item)
                except BaseException as e:
                    mux_err.append(e)

        th = threading.Thread(target=mux_worker, daemon=True)
        th.start()
        try:
            pending = None                    # (device frames, n)
            for s in range(0, F, chunk):
                block = verts_all[s:s + chunk]
                n = block.shape[0]
                if n < chunk:  # pad to the compiled chunk shape
                    block = jnp.concatenate(
                        [block, jnp.repeat(block[-1:], chunk - n, axis=0)],
                        axis=0)
                dev = render_block(block)
                if pending is not None:
                    q.put((pull(pending[0]), pending[1]))
                    if mux_err:
                        break
                pending = (dev, n)
            if pending is not None and not mux_err:
                q.put((pull(pending[0]), pending[1]))
        finally:
            q.put(None)
            th.join()
        if mux_err:
            raise mux_err[0]
    return out_path


def _to_hwc(frames: np.ndarray) -> np.ndarray:
    """(B, 3, H, W) device-native frames -> (B, H, W, 3) for the muxer
    (the flip runs on host; doing it on device costs ~100 ms/frame)."""
    if frames.ndim == 4 and frames.shape[1] == 3 and frames.shape[-1] != 3:
        return np.moveaxis(frames, 1, -1)
    return frames


def _block_renderer(avatar, background, cam_t, size, focal, window, chunk,
                    i420: bool = False):
    """Shared per-chunk frame renderer: returns (render_block, chunk,
    i420_active).

    Host-side render plan: tile spans + per-tile capacity for the fused
    Pallas rasterizer, and the few oversized faces routed to the fragment
    path (render/video.py::plan_tiled_render).  Frame sizes that don't
    tile into 8x128 blocks fall back to the fragment renderer (which also
    disables the I420 transfer — it only exists on the tiled path).
    """
    if background is None:
        background = np.ones((size, size, 3), np.float32)
    bg = jnp.asarray(background, jnp.float32)
    if bg.shape[:2] != (size, size):
        raise ValueError("background must match the frame size")

    colors = np.asarray(avatar.color, np.float64)
    if colors.max() > 1.0 + 1e-6:
        colors = colors / 255.0
    colors_j = jnp.asarray(colors, jnp.float32)
    faces_j = jnp.asarray(avatar.faces, jnp.int32)
    cam = jnp.asarray(np.asarray(cam_t), jnp.float32)

    tiled = size % 128 == 0
    if tiled:
        plan = video_lib.plan_tiled_render(
            avatar.v_template, avatar.faces, np.asarray(cam_t), size, size,
            focal)
        sf_j = jnp.asarray(plan["small_faces"])
        lb_j = tuple(jnp.asarray(b) for b in plan["large_buckets"]) or None
        lad_j = tuple(jnp.asarray(b) for b in plan["ladder_faces"])
        # Coefficient-table HBM scales with frames x the CSR chunk budget
        # summed over the base pass and the span-ladder rungs; bound the
        # transient tables to ~1.5 GB per dispatched frame block.
        from tpubody.render import pallas_raster as PR

        chunk_bytes = 4 * (5 + 6) * PR.CF_FUSED * 4  # (4, G*CF) f32 rows
        total_tc = plan["total_chunks"] + sum(
            spec[3] for spec in plan["ladder_specs"])
        chunk = max(1, min(chunk,
                           int(1.5e9 // max(total_tc * chunk_bytes, 1))))

        def render_block(block):
            # channel_major_out: the device-side HWC conversion costs
            # ~100 ms/frame at 1024^2; the host flips at mux time instead
            # (i420_out replaces both with the planar-YUV epilogue).
            return video_lib.render_frames_tiled(
                block, sf_j, lb_j, faces_j, colors_j, cam, bg,
                height=size, width=size, focal=focal,
                max_chunks=plan["max_chunks"], span_x=plan["span_x"],
                span_y=plan["span_y"],
                total_chunks=plan["total_chunks"],
                large_windows=plan["large_windows"],
                ladder_faces=lad_j, ladder_specs=plan["ladder_specs"],
                channel_major_out=True, i420_out=i420, shading="gouraud")

        return render_block, chunk, i420
    else:
        if window is None:
            window = video_lib.auto_window(
                avatar.v_template, avatar.faces, np.asarray(cam_t),
                size, size, focal)

        def render_block(block):
            return video_lib.render_frames(
                block, faces_j, colors_j, cam, bg,
                height=size, width=size, focal=focal, window=window)

    return render_block, chunk, False


def _animate_video_multihost(avatar, poses, trans, out_path, background,
                             cam_t, size, focal, fps, chunk, window) -> str:
    """Process-parallel animation: each process renders its frame slice on
    its own devices; rendered frames all-gather (DCN on a real pod) and
    process 0 muxes the MP4 (SURVEY.md §5 video-assembly collective)."""
    from jax.experimental import multihost_utils

    from tpubody.dist import multihost as mh

    render_block, chunk, _ = _block_renderer(
        avatar, background, cam_t, size, focal, window, chunk)

    F = poses.shape[0]
    nproc = jax.process_count()
    per = -(-F // nproc)                       # lockstep per-process length
    start, stop = mh.process_frame_slice(F)
    local_poses = np.asarray(poses[start:stop])
    local_trans = np.asarray(trans[start:stop])
    n_local = local_poses.shape[0]
    if n_local < per:                          # tail process pads; trimmed
        reps = per - n_local                   # after the gather
        src_p = local_poses[-1:] if n_local else np.zeros_like(poses[:1])
        src_t = local_trans[-1:] if n_local else np.zeros_like(trans[:1])
        local_poses = np.concatenate(
            [local_poses, np.repeat(src_p, reps, axis=0)], axis=0)
        local_trans = np.concatenate(
            [local_trans, np.repeat(src_t, reps, axis=0)], axis=0)

    verts_local = rigging.animate(avatar, local_poses, local_trans)
    blocks = []
    for s in range(0, per, chunk):
        block = verts_local[s:s + chunk]
        n = block.shape[0]
        if n < chunk:
            block = jnp.concatenate(
                [block, jnp.repeat(block[-1:], chunk - n, axis=0)], axis=0)
        blocks.append(_to_hwc(np.asarray(render_block(block)))[:n])
    local_frames = np.concatenate(blocks, axis=0)[:per]

    # (nproc * per, H, W, 3) in process order; only the LAST process's
    # slice is padded, so [:F] is the in-order clip.
    gathered = np.asarray(multihost_utils.process_allgather(
        local_frames, tiled=True))
    if jax.process_index() == 0:
        with video_lib.VideoWriter(out_path, fps=fps,
                                   size=(size, size)) as writer:
            for i in range(F):
                writer.write(gathered[i])
    multihost_utils.sync_global_devices("tpubody_animate_multihost")
    return out_path


def orbit_video(
    avatar: rigging.RiggedAvatar,
    out_path: str,
    pose: Optional[np.ndarray] = None,
    n_frames: int = 120,
    cam_t: np.ndarray = (0.0, 0.0, 2.5),
    **kw,
) -> str:
    """Turntable render: the camera orbits a single posed avatar
    (reference open3d_camera_render, lib/model2video.py:348-474 —
    implemented as an equivalent per-frame y-rotation of the mesh, which
    keeps the batched renderer's fixed camera)."""
    p = np.zeros((1, 24, 3)) if pose is None else np.asarray(pose)[None]
    verts = np.asarray(rigging.animate(avatar, p))[0]
    center = verts.mean(axis=0)
    angles = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    frames = []
    for a in angles:
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        frames.append((verts - center) @ R.T + center)
    clip = motion_lib.MotionClip(
        poses=np.zeros((n_frames, 24, 3)),
        trans=np.zeros((n_frames, 3)), fps=30.0)
    # Render the precomputed orbit frames through the batched renderer.
    from tpubody.render import video as video_lib
    colors = np.asarray(avatar.color, np.float64)
    if colors.max() > 1.0 + 1e-6:
        colors = colors / 255.0
    size = kw.get("size", video_lib.DEFAULT_SIZE)
    focal = kw.get("focal", video_lib.DEFAULT_FOCAL)
    bg = jnp.ones((size, size, 3), jnp.float32)
    writer = video_lib.VideoWriter(out_path, fps=30.0, size=(size, size))
    chunk = kw.get("chunk", 8)
    varr = jnp.asarray(np.stack(frames), jnp.float32)
    faces_j = jnp.asarray(avatar.faces, jnp.int32)
    colors_j = jnp.asarray(colors, jnp.float32)
    cam = jnp.asarray(np.asarray(cam_t), jnp.float32)
    tiled = size % 128 == 0
    if tiled:
        # Plan from the orbit's first frame (extents are rotation-stable
        # up to the slack factor).
        plan = video_lib.plan_tiled_render(
            frames[0], avatar.faces, np.asarray(cam_t), size, size, focal)
        sf_j = jnp.asarray(plan["small_faces"])
        lb_j = tuple(jnp.asarray(b) for b in plan["large_buckets"]) or None
        lad_j = tuple(jnp.asarray(b) for b in plan["ladder_faces"])
        from tpubody.render import pallas_raster as PR

        chunk_bytes = 4 * (5 + 6) * PR.CF_FUSED * 4
        total_tc = plan["total_chunks"] + sum(
            spec[3] for spec in plan["ladder_specs"])
        chunk = max(1, min(chunk,
                           int(1.5e9 // max(total_tc * chunk_bytes, 1))))
    with writer:
        for s0 in range(0, n_frames, chunk):
            block = varr[s0:s0 + chunk]
            n = block.shape[0]
            if n < chunk:
                block = jnp.concatenate(
                    [block, jnp.repeat(block[-1:], chunk - n, axis=0)],
                    axis=0)
            if tiled:
                imgs = video_lib.render_frames_tiled(
                    block, sf_j, lb_j, faces_j, colors_j, cam, bg,
                    height=size, width=size, focal=focal,
                    max_chunks=plan["max_chunks"], span_x=plan["span_x"],
                    span_y=plan["span_y"],
                    total_chunks=plan["total_chunks"],
                    large_windows=plan["large_windows"],
                    ladder_faces=lad_j, ladder_specs=plan["ladder_specs"])
            else:
                imgs = video_lib.render_frames(
                    block, faces_j, colors_j, cam, bg,
                    height=size, width=size, focal=focal)
            arr = np.asarray(imgs)
            for i in range(n):
                writer.write(arr[i])
    return out_path


def animate_from_amass(avatar_path: str, amass_path: str, out_path: str,
                       stride: int = 2, **kw) -> str:
    """Reference main_or parity (lib/model2video.py:533-553; frame stride 2
    :514-522)."""
    avatar = rigging.load_avatar(avatar_path)
    clip = motion_lib.read_amass(amass_path)
    return animate_video(avatar, clip, out_path, stride=stride, **kw)


def animate_from_mixamo(avatar_path: str, mixamo_path: str, out_path: str,
                        **kw) -> str:
    """Reference model2video_miaxmo main_or parity (stride 1, :524-533)."""
    avatar = rigging.load_avatar(avatar_path)
    clip = motion_lib.read_mixamo(mixamo_path)
    return animate_video(avatar, clip, out_path, stride=1, **kw)


def animate_mixamo_batch(avatar_path: str, mixamo_root: str, out_dir: str,
                         prefix: str = "or_", **kw) -> list:
    """Render every Mixamo clip under ``mixamo_root`` (one subdirectory per
    clip holding ``result.pkl``, like data/mixamo/0007..0145) to
    ``<out_dir>/<prefix><clip>.mp4`` — the reference's batch __main__ loop
    (lib/model2video_miaxmo.py:553-576, 601-611).  The avatar loads once;
    each clip reuses the compiled skinning/render programs (shapes permit)."""
    import os

    avatar = rigging.load_avatar(avatar_path)
    outs = []
    for name in sorted(os.listdir(mixamo_root)):
        pkl = os.path.join(mixamo_root, name, "result.pkl")
        if not os.path.isfile(pkl):
            continue
        clip = motion_lib.read_mixamo(pkl)
        out_path = os.path.join(out_dir, f"{prefix}{name}.mp4")
        outs.append(animate_video(avatar, clip, out_path, stride=1, **kw))
    return outs
