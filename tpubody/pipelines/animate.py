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
) -> str:
    """Render the avatar driven by the clip into an MP4 at ``out_path``."""
    poses = clip.poses[::stride]
    trans = clip.trans[::stride]
    F = poses.shape[0]
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

    # All-frame skinning in one program.
    verts_all = rigging.animate(avatar, poses, trans)

    if window is None:
        # Per-avatar rasterization window from projected face extents —
        # the pass-1 fragment count (and throughput) is quadratic in it.
        window = video_lib.auto_window(
            avatar.v_template, avatar.faces, np.asarray(cam_t),
            size, size, focal)

    # Reconstructed avatars have ~700k mostly-subpixel faces plus a few
    # large band faces; a single conservative window would allocate
    # faces x window^2 x chunk fragments (OOM).  Above a fragment budget,
    # switch to the two-class binned rasterizer, frame by frame.
    FRAG_BUDGET = 1 << 28
    use_binned = avatar.faces.shape[0] * window * window * chunk > FRAG_BUDGET
    if use_binned:
        from tpubody.render import raster as raster_lib
        v0 = np.asarray(avatar.v_template) @ video_lib._PRE_ROT.T
        v0 = (v0 + np.asarray(cam_t)) @ video_lib._FLIP_YZ.T
        z0 = np.maximum(-v0[:, 2], 1e-6)
        screen0 = np.stack([v0[:, 0] / z0 * focal + size / 2,
                            -v0[:, 1] / z0 * focal + size / 2, z0], axis=1)
        tri = screen0[:, :2][np.asarray(avatar.faces)]
        ext = (tri.max(axis=1) - tri.min(axis=1)).max(axis=1)
        large_w = int(min(max(np.ceil(ext.max() * 1.3 / 8) * 8 + 8, 32), 512))
        # Pick the small-class window minimizing total fragments
        # (N_small * s^2 + N_large * large_w^2): grid meshes are dominated
        # by ~1px faces, so the optimum is much tighter than any percentile.
        candidates = (8, 16, 24, 32, 48)
        costs = [( (ext <= s - 2).sum() * s * s
                   + (ext > s - 2).sum() * large_w * large_w, s)
                 for s in candidates]
        small_w = min(costs)[1]
        sf, lf = raster_lib.split_faces_by_extent(
            screen0, avatar.faces, small_w)
        sf_j, lf_j = jnp.asarray(sf), jnp.asarray(lf)

    if mesh is not None:
        verts_all = mesh_lib.shard_frames(verts_all, mesh)

    writer = video_lib.VideoWriter(
        out_path, fps=fps or (clip.fps / stride), size=(size, size))
    with writer:
        if use_binned:
            for i in range(F):
                frame = video_lib.render_frame_binned(
                    verts_all[i], sf_j, lf_j, faces_j, colors_j, cam, bg,
                    height=size, width=size, focal=focal,
                    small_window=small_w, large_window=large_w)
                writer.write(np.asarray(frame))
        else:
            for s in range(0, F, chunk):
                block = verts_all[s:s + chunk]
                n = block.shape[0]
                if n < chunk:  # pad to the compiled chunk shape
                    block = jnp.concatenate(
                        [block, jnp.repeat(block[-1:], chunk - n, axis=0)],
                        axis=0)
                frames = video_lib.render_frames(
                    block, faces_j, colors_j, cam, bg,
                    height=size, width=size, focal=focal, window=window)
                frames_np = np.asarray(frames)  # device->host gather
                for i in range(n):
                    writer.write(frames_np[i])
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
    with writer:
        for s0 in range(0, n_frames, chunk):
            block = varr[s0:s0 + chunk]
            n = block.shape[0]
            if n < chunk:
                block = jnp.concatenate(
                    [block, jnp.repeat(block[-1:], chunk - n, axis=0)],
                    axis=0)
            imgs = video_lib.render_frames(
                block, jnp.asarray(avatar.faces, jnp.int32),
                jnp.asarray(colors, jnp.float32),
                jnp.asarray(np.asarray(cam_t), jnp.float32), bg,
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
