"""Offscreen mesh viewer: render snapshots of meshes/fits to PNG.

Capability parity with the reference's interactive viewers
(lib/Gen_SMPLH/mesh_viewer.py:26-97 pyrender MeshViewer, trimesh .show()
calls throughout): since TPU hosts are headless, "viewing" renders through
the TPU rasterizer to image files instead of a GL window.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpubody.render import raster as raster_lib
from tpubody.render import video as video_lib


def snapshot(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    size: int = 512,
    cam_t: Optional[np.ndarray] = None,
    out_path: Optional[str] = None,
    background: float = 1.0,
) -> np.ndarray:
    """Render one shaded view of a mesh; returns (size, size, 3) in [0,1]
    and optionally writes a PNG."""
    v = np.asarray(verts, np.float64)
    center = v.mean(axis=0)
    extent = float(np.abs(v - center).max())
    if cam_t is None:
        cam_t = np.array([0.0, 0.0, 3.5 * max(extent, 1e-6)])
    if colors is None:
        colors = np.full_like(v, 0.65)
    elif np.asarray(colors).max() > 1.0 + 1e-6:
        colors = np.asarray(colors) / 255.0

    focal = size  # ~53 deg fov
    bg = jnp.full((size, size, 3), background, jnp.float32)
    img = video_lib.render_frame(
        jnp.asarray(v - center, jnp.float32),
        jnp.asarray(faces, jnp.int32),
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(cam_t, jnp.float32), bg,
        height=size, width=size, focal=float(focal))
    out = np.asarray(img)
    if out_path:
        from tpubody.image import ops
        ops.write_image(out_path, out)
    return out


def overlay_fit(
    image: np.ndarray,            # (H, W, 3) photo
    verts: np.ndarray,
    faces: np.ndarray,
    camera_transl: np.ndarray,
    camera_center: np.ndarray,
    focal: float = 5000.0,
    alpha: float = 0.6,
    out_path: Optional[str] = None,
) -> np.ndarray:
    """Blend the rendered fit over the photo (the smplh2rgb_rend.png
    overlay artifact, fit_single_frame.py:470-521)."""
    from tpubody.render import bodymaps
    H, W = np.asarray(image).shape[:2]
    screen = bodymaps.project_to_screen(
        jnp.asarray(verts, jnp.float32),
        jnp.asarray(camera_transl, jnp.float32),
        jnp.asarray(camera_center, jnp.float32), focal)
    normals = raster_lib.vertex_normals(
        jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32))
    shade = jnp.clip(jnp.abs(normals[:, 2:3]), 0.2, 1.0)
    colors = jnp.concatenate([shade * 0.7, shade * 0.7, shade * 0.9], axis=1)
    out = raster_lib.rasterize(
        screen, jnp.asarray(faces, jnp.int32), colors, H, W, window=64)
    base = np.asarray(image, np.float64)
    if base.max() > 1.5:
        base = base / 255.0
    rendered = np.asarray(out.attrs)
    mask = np.asarray(out.mask)[..., None]
    blended = np.where(mask, (1 - alpha) * base + alpha * rendered, base)
    if out_path:
        from tpubody.image import ops
        ops.write_image(out_path, blended)
    return blended
