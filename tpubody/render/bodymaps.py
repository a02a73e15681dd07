"""Body value-map rendering: front/back normal maps + skinning-weight maps.

Capability parity with the reference opendr Render
(utils/render_model.py:17-155) on the TPU rasterizer:

  * same camera: perspective f=5000, translation only (opendr ProjectPoints
    with rt=0, :32-33),
  * normals encoded (n+1)/2 with white (1.0) background (:57-60),
  * front/back split by face-normal z sign (models/smplh_np.py divide_face
    -> tpubody.models.smpl.face_normals_z, vectorized),
  * ALL 24 weight channels rasterized in ONE pass (the reference needs 8
    separate 3-channel opendr passes, :101-110),
  * the (H, W, 30) ``smplh_value`` layout matches main.py:93:
    [front_normal(3), back_normal(3), weights(24)].
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpubody.models import smpl as smpl_lib
from tpubody.render import raster as raster_lib

DEFAULT_FOCAL = 5000.0


class BodyMaps(NamedTuple):
    front_normal: jnp.ndarray   # (H, W, 3) in [0,1], background 1.0
    back_normal: jnp.ndarray    # (H, W, 3)
    weight_map: jnp.ndarray     # (H, W, 24), background 1.0
    value: jnp.ndarray          # (H, W, 30) concatenated smplh_value
    mask: jnp.ndarray           # (H, W) body silhouette (front faces)


def project_to_screen(
    verts: jnp.ndarray, camera_transl: jnp.ndarray,
    camera_center: jnp.ndarray, focal: float = DEFAULT_FOCAL,
) -> jnp.ndarray:
    """Perspective projection to (x_pix, y_pix, cam_depth) — the opendr
    ProjectPoints setup (utils/render_model.py:32-33: identity rotation,
    translation t, principal point c)."""
    cam = verts + camera_transl
    z = jnp.maximum(cam[..., 2:3], 1e-6)
    x = cam[..., 0:1] / z * focal + camera_center[0]
    y = cam[..., 1:2] / z * focal + camera_center[1]
    return jnp.concatenate([x, y, cam[..., 2:3]], axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width", "window"))
def _render_channels(screen, faces, attrs, height, width, window,
                     background):
    out = raster_lib.rasterize(screen, faces, attrs, height, width,
                               window=window)
    bg = jnp.asarray(background, out.attrs.dtype)
    img = jnp.where(out.mask[..., None], out.attrs, bg)
    return img, out.mask


def _render_channels_tiled(screen, faces, attrs, height, width,
                           background: float = 1.0):
    """Fused tiled-Pallas rasterization of a channel stack (background-
    composited), planned host-side from the projected extents."""
    from tpubody.render import pallas_raster as PR

    from tpubody.render import video as video_lib

    s = np.asarray(screen)[:, :2]
    tri = s[np.asarray(faces)]
    # Degenerate (zero-area) padding faces are culled by the binner; drop
    # them from the occupancy estimate too.
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    area = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    live = np.isfinite(area) & (np.abs(area) > 1e-12)
    tri = tri[live]
    ext = (tri.max(axis=1) - tri.min(axis=1)).max(axis=1) if tri.size \
        else np.zeros(0)
    bound = float(ext.max()) * 1.05 + 1.0 if ext.size else 8.0
    sx, sy = PR.max_span_for(bound)
    # This-pose per-tile slot occupancy -> CSR chunk budget.
    occ = video_lib._tile_occupancy(tri, sx, sy, height, width)
    tc = video_lib._chunk_budget(occ, 1.25)
    attr, mask, _, _ = PR.render_attrs_tiled(
        screen[None], faces, attrs, height, width,
        span_x=sx, span_y=sy, total_chunks=tc)
    img = jnp.where(mask[0][..., None], attr[0], jnp.asarray(
        background, attr.dtype))
    return img, mask[0]


def render_body_maps(
    verts: np.ndarray,            # (V, 3) posed SMPLH vertices
    faces: np.ndarray,            # (F, 3)
    weights24: np.ndarray,        # (V, 24) SMPL skinning weights
    camera_transl: np.ndarray,    # (3,)
    camera_center: np.ndarray,    # (2,)
    height: int,
    width: int,
    focal: float = DEFAULT_FOCAL,
    window: Optional[int] = None,
) -> BodyMaps:
    """Render the full (H, W, 30) value map the reconstruction consumes."""
    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    w = jnp.asarray(weights24, jnp.float32)

    screen = project_to_screen(
        v, jnp.asarray(camera_transl, jnp.float32),
        jnp.asarray(camera_center, jnp.float32), focal)

    if window is None:
        # Tight per-mesh window from projected face extents (fragment count
        # is faces x window^2 — the rasterization cost knob).
        s = np.asarray(screen)[:, :2]
        tri = s[np.asarray(faces)]
        ext = float((tri.max(axis=1) - tri.min(axis=1)).max())
        window = int(min(max(np.ceil(ext * 1.05 / 8) * 8 + 8, 16), 256))

    # Front/back face subsets by z-sign of the face normal.
    zn = np.asarray(smpl_lib.face_normals_z(v, np.asarray(faces)))
    faces_np = np.asarray(faces, np.int32)

    # Pad both subsets to the full face count with degenerate (0,0,0)
    # faces (zero area -> culled in the rasterizer): front/back/weight
    # rasterizations then share ONE compiled shape instead of recompiling
    # per data-dependent subset size.
    def _pad_faces(sel):
        out = np.zeros_like(faces_np)
        out[:sel.shape[0]] = sel
        return jnp.asarray(out)

    front_faces = _pad_faces(faces_np[zn <= 0])
    back_faces = _pad_faces(faces_np[zn > 0])

    # Per-subset vertex normals (VertNormals of the half-mesh).
    n_front = raster_lib.vertex_normals(v, front_faces)
    n_back = raster_lib.vertex_normals(v, back_faces)

    # Tileable sizes render through the fused Pallas rasterizer (no
    # faces x window^2 fragments, no per-pixel shading gathers, much
    # smaller XLA programs); others keep the fragment path.
    if height % 8 == 0 and width % 128 == 0:
        front_img, front_mask = _render_channels_tiled(
            screen, front_faces, (n_front + 1.0) * 0.5, height, width)
        back_img, _ = _render_channels_tiled(
            screen, back_faces, (n_back + 1.0) * 0.5, height, width)
        weight_img, _ = _render_channels_tiled(
            screen, f, w, height, width)
    else:
        front_img, front_mask = _render_channels(
            screen, front_faces, (n_front + 1.0) * 0.5, height, width,
            window, 1.0)
        back_img, _ = _render_channels(
            screen, back_faces, (n_back + 1.0) * 0.5, height, width,
            window, 1.0)
        weight_img, _ = _render_channels(
            screen, f, w, height, width, window, 1.0)

    value = jnp.concatenate([front_img, back_img, weight_img], axis=-1)
    return BodyMaps(front_normal=front_img, back_normal=back_img,
                    weight_map=weight_img, value=value, mask=front_mask)


# Weight-visualization colormap (24 joints -> RGB composite), matching the
# reference's save_weigth2img composite (utils/render_model.py:142-155).
_WEIGHT_COLORMAP = np.array(
    [(0, 0, 0.5), (0, 0.5, 0.5), (0, 0.75, 0.5), (0, 1, 0.5),
     (0.5, 0, 0.5), (0.5, 0.5, 0.5), (0.5, 0.75, 0.5), (0.5, 1, 0.5),
     (0.75, 0, 0.5), (0.75, 0.5, 0.5), (0.75, 0.75, 0.5), (0.75, 1, 0.5),
     (1, 0, 0.5), (1, 0.5, 0.5), (1, 0.75, 0.5), (1, 1, 0.5),
     (0, 0, 1), (0, 0.5, 1), (0, 0.75, 1), (0, 1, 1),
     (0.5, 0, 1), (0.5, 0.5, 1), (0.5, 0.75, 1), (0.5, 1, 1)], np.float32)


def weights_to_rgb(weight_map: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 24) -> (H, W, 3) color composite for visualization."""
    return jnp.einsum("hwk,kc->hwc", jnp.asarray(weight_map),
                      jnp.asarray(_WEIGHT_COLORMAP))
