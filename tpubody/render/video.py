"""Shaded animation-frame rendering + MP4 muxing.

Replaces the reference's Open3D offscreen renderer + cv2 VideoWriter loop
(lib/model2video.py:226-309, 132-177):

  * same camera setup: 1024x1024 frames, pinhole f=2500 centered, extrinsic
    flip of the y/z axes (open3d_render.__init__ :277-289), the mesh
    pre-rotated by -pi/2 about x per frame (:300-309),
  * frames are rasterized + Lambert-shaded fully on TPU (render.raster);
    the per-frame python loop is replaced by a jitted, vmap-batched frame
    renderer — frames are the parallel axis (shardable over a device mesh),
  * H.264 muxing stays host-side via cv2 (IO boundary).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpubody.render import raster as raster_lib

DEFAULT_SIZE = 1024
DEFAULT_FOCAL = 2500.0

# Max fragments one large-face rasterize call may materialize PER FRAME
# (x frame-chunk x ~4 f32 arrays of transient memory).
FRAG_BUDGET = 12_000_000

# Rotate -pi/2 about x (the reference applies this to every frame's verts,
# lib/model2video.py:302-304).
_PRE_ROT = np.array([[1.0, 0, 0],
                     [0, 0.0, 1.0],
                     [0, -1.0, 0.0]])
# Extrinsic: flip y and z (open3d extrinsic diag(1,-1,-1), :286-289).
_FLIP_YZ = np.diag([1.0, -1.0, -1.0])


class FrameCamera(NamedTuple):
    focal: float
    center: Tuple[float, float]
    cam_t: np.ndarray     # (3,) camera translation


@functools.partial(jax.jit, static_argnames=("height", "width", "window"))
def render_frame(
    verts: jnp.ndarray,        # (V, 3) posed vertices
    faces: jnp.ndarray,        # (F, 3)
    colors: jnp.ndarray,       # (V, 3) in [0,1]
    cam_t: jnp.ndarray,        # (3,)
    background: jnp.ndarray,   # (H, W, 3) in [0,1]
    height: int = DEFAULT_SIZE,
    width: int = DEFAULT_SIZE,
    focal: float = DEFAULT_FOCAL,
    window: int = 64,
) -> jnp.ndarray:
    """Shade one frame: returns (H, W, 3) float in [0,1]."""
    v = verts @ jnp.asarray(_PRE_ROT.T, verts.dtype)
    v = (v + cam_t) @ jnp.asarray(_FLIP_YZ.T, verts.dtype)
    # After the flip the camera looks down -z; use -z as depth.
    z = -v[..., 2:3]
    z = jnp.maximum(z, 1e-6)
    x = v[..., 0:1] / z * focal + width / 2.0
    y = -v[..., 1:2] / z * focal + height / 2.0
    screen = jnp.concatenate([x, y, z], axis=-1)

    normals = raster_lib.vertex_normals(v, faces)
    attrs = jnp.concatenate([colors, normals], axis=-1)
    out = raster_lib.rasterize(screen, faces, attrs, height, width,
                               window=window)
    col = out.attrs[..., :3]
    nrm = out.attrs[..., 3:6]
    img = raster_lib.shade_lambert(out, nrm, col, light_dir=(0.3, 0.3, -1.0),
                                   background=background)
    return jnp.clip(img, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("height", "width", "window"))
def render_frames(
    verts_seq: jnp.ndarray,    # (F, V, 3)
    faces: jnp.ndarray,
    colors: jnp.ndarray,
    cam_t: jnp.ndarray,        # (3,) or (F, 3)
    background: jnp.ndarray,
    height: int = DEFAULT_SIZE,
    width: int = DEFAULT_SIZE,
    focal: float = DEFAULT_FOCAL,
    window: int = 64,
) -> jnp.ndarray:
    """Batch-render F frames in one compiled program."""
    cam_axis = 0 if cam_t.ndim == 2 else None
    return jax.vmap(
        lambda v, c: render_frame(v, faces, colors, c, background,
                                  height, width, focal, window),
        in_axes=(0, cam_axis))(verts_seq, cam_t)


@functools.partial(jax.jit, static_argnames=("height", "width",
                                             "small_window", "large_window"))
def render_frame_binned(
    verts: jnp.ndarray, small_faces: jnp.ndarray, large_faces: jnp.ndarray,
    all_faces: jnp.ndarray, colors: jnp.ndarray, cam_t: jnp.ndarray,
    background: jnp.ndarray,
    height: int = DEFAULT_SIZE, width: int = DEFAULT_SIZE,
    focal: float = DEFAULT_FOCAL,
    small_window: int = 32, large_window: int = 256,
) -> jnp.ndarray:
    """render_frame with two-class face binning (raster.rasterize_binned):
    body meshes have a handful of large faces, so the dominant small class
    runs with a tight fragment window.

    Note: use per-frame (the production path batches via auto_window'd
    render_frames instead) — vmapping this function currently trips a TPU
    compiler crash in the two-scatter composite at 1024^2.
    """
    v = verts @ jnp.asarray(_PRE_ROT.T, verts.dtype)
    v = (v + cam_t) @ jnp.asarray(_FLIP_YZ.T, verts.dtype)
    z = jnp.maximum(-v[..., 2:3], 1e-6)
    x = v[..., 0:1] / z * focal + width / 2.0
    y = -v[..., 1:2] / z * focal + height / 2.0
    screen = jnp.concatenate([x, y, z], axis=-1)

    normals = raster_lib.vertex_normals(v, all_faces)
    attrs = jnp.concatenate([colors, normals], axis=-1)
    out = raster_lib.rasterize_binned(
        screen, small_faces, large_faces, attrs, height, width,
        small_window=small_window, large_window=large_window)
    img = raster_lib.shade_lambert(
        out, out.attrs[..., 3:6], out.attrs[..., :3],
        light_dir=(0.3, 0.3, -1.0), background=background)
    return jnp.clip(img, 0.0, 1.0)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_chunks", "span_x", "span_y",
                     "total_chunks", "large_windows", "ladder_specs",
                     "to_uint8", "channel_major_out", "i420_out",
                     "shading"))
def render_frames_tiled(
    verts_seq: jnp.ndarray,    # (B, V, 3) posed vertices
    small_faces: jnp.ndarray,  # (Fs, 3) faces within the tile-span budget
    large_buckets,             # tuple of (Fl_i, 3) face arrays, or None
    all_faces: jnp.ndarray,    # (F, 3) full topology (for vertex normals)
    colors: jnp.ndarray,       # (V, 3)
    cam_t: jnp.ndarray,
    background: jnp.ndarray,
    height: int = DEFAULT_SIZE,
    width: int = DEFAULT_SIZE,
    focal: float = DEFAULT_FOCAL,
    max_chunks: int = 8,
    span_x: int = 2,
    span_y: int = 5,
    total_chunks: int = None,  # CSR chunk budget (plan_tiled_render)
    large_windows: Tuple[int, ...] = (),   # static; parallel to buckets
    ladder_faces=(),           # tuple of (Fi, 3) face arrays (operands)
    ladder_specs: Tuple[Tuple[int, int, int, int], ...] = (),
    # ladder_specs entries: (span_x, span_y, max_chunks, total_chunks)
    to_uint8: bool = True,
    channel_major_out: bool = False,
    i420_out: bool = False,
    shading: str = "phong",
) -> jnp.ndarray:
    """Batch-render frames through the fused tiled Pallas rasterizer.

    ~35x faster than the fragment path at 1024^2 (no faces x window^2
    fragment blow-up, no per-pixel shading gathers).  Faces whose projected
    extent exceeds the base span budget render through additional tiled
    Pallas passes with wider tile spans (the ladder: ``ladder_faces`` +
    static ``ladder_specs``, sized by ``plan_tiled_render``) and
    depth-composite — reconstructed avatars can have tens of thousands of
    such faces (42k measured on the test03 1024^2 mesh), which previously
    all fell back to the faces x window^2 fragment path.  Only faces beyond
    the ladder's top rung (or non-tiling frame sizes) still use the
    fragment path (``large_buckets``/``large_windows``).
    Returns (B, H, W, 3) uint8 (4x smaller host transfer) unless
    ``to_uint8=False``.
    """
    from tpubody.render import pallas_raster as PR

    v = verts_seq @ jnp.asarray(_PRE_ROT.T, verts_seq.dtype)
    v = (v + cam_t) @ jnp.asarray(_FLIP_YZ.T, verts_seq.dtype)
    z = jnp.maximum(-v[..., 2:3], 1e-6)
    x = v[..., 0:1] / z * focal + width / 2.0
    y = -v[..., 1:2] / z * focal + height / 2.0
    screen = jnp.concatenate([x, y, z], axis=-1)

    normals = jax.vmap(lambda vv: raster_lib.vertex_normals(vv, all_faces))(v)
    if shading == "gouraud":
        # Per-VERTEX Lambert: the kernel interpolates pre-shaded color
        # (3 channels) instead of (color, normal) (6) — halves the
        # per-chunk select-sum epilogue and shrinks the bin table's
        # group count 11 -> 8.  On reconstructed avatars (~2-4 px
        # triangles at 1024^2) vertex- vs pixel-shading is
        # indistinguishable; the default stays per-pixel ("phong").
        L = jnp.asarray((0.3, 0.3, -1.0), normals.dtype)
        L = L / jnp.linalg.norm(L)
        nn = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
        diff_v = jnp.clip(jnp.abs(nn @ L), 0.0, 1.0)       # (B, V)
        attrs = jnp.broadcast_to(colors, normals.shape) \
            * (0.35 + 0.65 * diff_v)[..., None]
    else:
        attrs = jnp.concatenate(
            [jnp.broadcast_to(colors, normals.shape), normals], axis=-1)

    # Channel-major throughout: the fused kernel writes (B, C, H, W)
    # natively; shading and compositing stay in that layout and only the
    # final 3-channel image transposes back (the per-channel detile cost
    # ~109 ms/frame at 1024^2 on the production avatar).
    attr, mask, depth, _ = PR.render_attrs_tiled(
        screen, small_faces, attrs, height, width,
        max_chunks=max_chunks, span_x=span_x, span_y=span_y,
        total_chunks=total_chunks, channel_major=True)

    for lf, spec in zip(ladder_faces or (), ladder_specs):
        sx2, sy2, nc2 = spec[:3]
        tc2 = spec[3] if len(spec) > 3 else None
        if int(lf.shape[0]) == 0:
            continue
        attr2, mask2, depth2, _ = PR.render_attrs_tiled(
            screen, lf, attrs, height, width,
            max_chunks=nc2, span_x=sx2, span_y=sy2, total_chunks=tc2,
            channel_major=True)
        take = mask2 & (depth2 < depth)
        depth = jnp.where(take, depth2, depth)
        attr = jnp.where(take[:, None], attr2, attr)
        mask = mask | mask2

    for bf, bw in zip(large_buckets or (), large_windows):
        if int(bf.shape[0]) == 0:
            continue
        big = jax.vmap(
            lambda s, a, bf=bf, bw=bw: raster_lib.rasterize(
                s, bf, a, height, width, window=bw)
        )(screen, attrs)
        take_big = big.depth < depth
        depth = jnp.minimum(depth, big.depth)
        attr = jnp.where(take_big[:, None],
                         big.attrs.transpose(0, 3, 1, 2), attr)
        mask = mask | big.mask

    if shading == "gouraud":
        shaded = attr[:, :3]                             # (B, 3, H, W)
    else:
        col = attr[:, :3]
        nrm = attr[:, 3:6]
        L = jnp.asarray((0.3, 0.3, -1.0), col.dtype)
        L = L / jnp.linalg.norm(L)
        n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=1, keepdims=True),
                              1e-12)
        diff = jnp.clip(jnp.abs(jnp.einsum("bchw,c->bhw", n, L)), 0.0, 1.0)
        shaded = col * (0.35 + 0.65 * diff)[:, None]
    img = jnp.where(mask[:, None], shaded, background.transpose(2, 0, 1))
    img = jnp.clip(img, 0.0, 1.0)
    if i420_out:
        # Planar YUV 4:2:0 epilogue: halves the device->host bytes vs
        # uint8 RGB (1.5 B/px) AND lands in the shape every H.264/MP4
        # encoder consumes natively — through a remote-device tunnel the
        # frame pull, not the render, floors the video pipeline
        # (measured ~21 MB/s, i.e. 146 ms per 3 MB 1024^2 RGB frame).
        return rgb_to_i420(img)
    if to_uint8:
        img = (img * 255.0 + 0.5).astype(jnp.uint8)
    if channel_major_out:
        return img                                       # (B, 3, H, W)
    # Channel-last conversion measured ~100 ms/frame at 1024^2 on TPU
    # (minor-dim-3 layouts are hostile); the video path avoids it with
    # channel_major_out=True and flips HWC on host at mux time.
    return img.transpose(0, 2, 3, 1)                     # (B, H, W, 3)


def rgb_to_i420(img: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, H, W) float RGB in [0,1] -> (B, H*3//2, W) uint8 planar
    I420 frames (limited-range BT.601 — the convention cv2's
    ``COLOR_YUV2BGR_I420`` inverts exactly; round-trip max err 1 LSB).

    Layout per frame: H rows of Y, then H//4 rows packing the (H/2, W/2)
    U plane, then H//4 rows of V — byte-identical to the I420 buffer an
    MP4 encoder consumes, so the host does ONE cv2.cvtColor (4 ms/frame
    at 1024^2) and no channel reorg (the (B,3,H,W)->HWC host moveaxis
    cost 41 ms/frame)."""
    B, _, H, W = img.shape
    r, g, b = img[:, 0], img[:, 1], img[:, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) / 1.772
    cr = (r - y) / 1.402
    Y = (16.0 + 219.0 * y + 0.5).astype(jnp.uint8)           # (B, H, W)
    # Chroma: 2x2 mean then limited-range quantize.
    cb = cb.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    cr = cr.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    U = (128.0 + 224.0 * cb + 0.5).astype(jnp.uint8)         # (B, H/2, W/2)
    V = (128.0 + 224.0 * cr + 0.5).astype(jnp.uint8)
    return jnp.concatenate(
        [Y, U.reshape(B, H // 4, W), V.reshape(B, H // 4, W)], axis=1)


def _tile_occupancy(tri: np.ndarray, span_x: int, span_y: int,
                    height: int, width: int) -> np.ndarray:
    """Per-tile slot counts when binning these triangles with the given
    tile spans (rest-pose estimate for chunk-budget sizing)."""
    from tpubody.render import pallas_raster as PR

    TX = width // PR.TILE_W
    TY = height // PR.TILE_H
    count = np.zeros(TX * TY, np.int64)
    if not tri.shape[0]:
        return count
    bmin = tri.min(axis=1)
    bmax = tri.max(axis=1)
    tx0 = np.clip(np.floor(bmin[:, 0]).astype(int) // PR.TILE_W, 0, TX - 1)
    tx1 = np.clip(np.floor(bmax[:, 0]).astype(int) // PR.TILE_W, 0, TX - 1)
    ty0 = np.clip(np.floor(bmin[:, 1]).astype(int) // PR.TILE_H, 0, TY - 1)
    ty1 = np.clip(np.floor(bmax[:, 1]).astype(int) // PR.TILE_H, 0, TY - 1)
    for dy in range(span_y):
        for dx in range(span_x):
            tid = np.clip(ty0 + dy, 0, TY - 1) * TX + np.clip(tx0 + dx, 0,
                                                              TX - 1)
            ok = (ty0 + dy <= ty1) & (tx0 + dx <= tx1)
            np.add.at(count, tid[ok], 1)
    return count


def _chunk_budget(counts: np.ndarray, slack: float) -> int:
    """CSR chunk budget for rest-pose per-tile slot ``counts``: every tile
    owns >=1 chunk; slack absorbs animation deformation."""
    from tpubody.render import pallas_raster as PR

    per_tile = np.maximum(-(-counts * slack // PR.CF_FUSED), 1)
    return int(per_tile.sum())


def plan_tiled_render(verts: np.ndarray, faces: np.ndarray, cam_t,
                      height: int = DEFAULT_SIZE, width: int = DEFAULT_SIZE,
                      focal: float = DEFAULT_FOCAL, slack: float = 1.4,
                      max_small_extent: float = 48.0,
                      ladder_bounds: Tuple[float, ...] = (96.0, 192.0,
                                                          384.0)):
    """Host-side planning for render_frames_tiled: split faces into extent
    classes from the rest pose's projected extents, size the tile spans per
    class, and bound each class's per-tile face capacity (max_chunks) from a
    rest-pose bin count.  ``slack`` absorbs animation deformation.

    Classes: extent <= max_small_extent renders in the base tiled pass;
    each ``ladder_bounds`` rung gets its own tiled pass with wider spans
    (production reconstructed avatars have tens of thousands of over-span
    faces — the fragment path at that count costs GBs of transients); only
    faces beyond the top rung fall back to the fragment-window path."""
    from tpubody.render import pallas_raster as PR

    v = np.asarray(verts, np.float64) @ _PRE_ROT.T
    v = (v + np.asarray(cam_t)) @ _FLIP_YZ.T
    z = np.maximum(-v[:, 2], 1e-6)
    xs = v[:, 0] / z * focal + width / 2.0
    ys = -v[:, 1] / z * focal + height / 2.0
    pts = np.stack([xs, ys], axis=1)
    f = np.asarray(faces)
    tri = pts[f]
    ext = (tri.max(axis=1) - tri.min(axis=1)).max(axis=1) * slack

    small_bound = min(float(max_small_extent), float(ext.max()) + 1.0)
    small = f[ext <= small_bound]
    large = f[ext > small_bound]
    span_x, span_y = PR.max_span_for(small_bound)

    occ = _tile_occupancy(tri[ext <= small_bound], span_x, span_y,
                          height, width)
    max_chunks = int(np.clip(
        np.ceil(int(occ.max()) * slack / PR.CF_FUSED), 1, 64))
    total_chunks = _chunk_budget(occ, slack)

    large_window = 256
    if large.shape[0]:
        lw = float(ext[ext > small_bound].max())
        large_window = int(min(max(np.ceil(lw / 8) * 8 + 8, 32), 512))

    # Span-ladder classes: over-span faces keep riding the tiled Pallas
    # kernel, each rung with tile spans sized for its extent bound and a
    # CSR chunk budget sized from the rung's rest-pose occupancy.
    ladder_faces, ladder_specs = [], []
    lo = small_bound
    for bound in ladder_bounds:
        if bound <= lo:
            continue
        sel_mask = (ext > lo) & (ext <= bound)
        sel = f[sel_mask]
        if sel.shape[0]:
            sx, sy = PR.max_span_for(bound)
            occ_r = _tile_occupancy(tri[sel_mask], sx, sy, height, width)
            nc = int(np.clip(
                np.ceil(int(occ_r.max()) * slack / PR.CF_FUSED), 1, 64))
            ladder_faces.append(sel.astype(np.int32))
            ladder_specs.append((sx, sy, nc, _chunk_budget(occ_r, slack)))
        lo = bound

    # Fragment-path memory plan for faces beyond the ladder.  A single
    # rasterize call materializes faces x window^2 fragments — bucket by
    # extent into pow2 windows, then split each bucket so no call exceeds
    # FRAG_BUDGET fragments per frame; calls composite by depth inside
    # render_frames_tiled.
    large_buckets, large_windows = [], []
    frag_budget = FRAG_BUDGET
    if (ext > lo).any():
        ext_l = ext[ext > small_bound]
        huge = large[ext_l > lo]
        ext_h = ext_l[ext_l > lo]
        full_win = int(max(height, width))
        for w in (512, None):
            if w is None:
                # Catch-all: faces beyond 512 px render through a
                # frame-sized window — the clamped anchor in
                # raster.rasterize guarantees the visible part is fully
                # covered no matter how large the projected bbox is.
                sel = huge[ext_h > lo]
                win = full_win
            else:
                if w <= lo:
                    continue
                sel = huge[(ext_h > lo) & (ext_h <= w)]
                win = int(min(w + 8, full_win))
                lo = w
            if not sel.shape[0]:
                continue
            per_call = max(1, frag_budget // (win * win))
            for s in range(0, sel.shape[0], per_call):
                large_buckets.append(sel[s:s + per_call].astype(np.int32))
                large_windows.append(win)
    return dict(small_faces=small.astype(np.int32),
                large_faces=large.astype(np.int32),
                span_x=span_x, span_y=span_y, max_chunks=max_chunks,
                total_chunks=total_chunks,
                large_window=large_window,
                large_buckets=large_buckets,
                large_windows=tuple(large_windows),
                ladder_faces=ladder_faces,
                ladder_specs=tuple(ladder_specs))


@functools.partial(jax.jit, static_argnames=("height", "width", "focal"))
def screen_bbox(
    verts_seq: jnp.ndarray,    # (F, V, 3) posed vertices
    cam_t: jnp.ndarray,
    height: int = DEFAULT_SIZE,
    width: int = DEFAULT_SIZE,
    focal: float = DEFAULT_FOCAL,
) -> jnp.ndarray:
    """Projected-pixel bounds [xmin, xmax, ymin, ymax] over ALL frames
    (same camera math as render_frames/_tiled).  Rasterized coverage is
    confined to the projected vertex hull, so this bounds every non-
    background pixel of every frame — the animate path uses it to pull
    only the body window across the host boundary (a 1024^2 uint8 frame
    is ~3 MB; through a remote-device tunnel the full-frame transfer,
    not the render, is the video floor)."""
    v = verts_seq @ jnp.asarray(_PRE_ROT.T, verts_seq.dtype)
    v = (v + cam_t) @ jnp.asarray(_FLIP_YZ.T, verts_seq.dtype)
    z = jnp.maximum(-v[..., 2], 1e-6)
    x = v[..., 0] / z * focal + width / 2.0
    y = -v[..., 1] / z * focal + height / 2.0
    return jnp.stack([x.min(), x.max(), y.min(), y.max()])


def auto_window(verts: np.ndarray, faces: np.ndarray, cam_t,
                height: int = DEFAULT_SIZE, width: int = DEFAULT_SIZE,
                focal: float = DEFAULT_FOCAL, slack: float = 1.3,
                cap: int = 256) -> int:
    """Smallest safe per-face rasterization window for a mesh + camera.

    The rasterizer's pass-1 cost is faces x window^2 candidates, so window
    is THE throughput knob (64 -> 32 is ~4x fewer fragments).  Computed
    host-side once per avatar from the projected face bounding boxes of the
    rest pose (with slack for animation deformation), rounded up to a
    multiple of 8.
    """
    import numpy as _np
    v = _np.asarray(verts, _np.float64) @ _PRE_ROT.T
    v = (v + _np.asarray(cam_t)) @ _FLIP_YZ.T
    z = _np.maximum(-v[:, 2], 1e-6)
    x = v[:, 0] / z * focal + width / 2.0
    y = -v[:, 1] / z * focal + height / 2.0
    pts = _np.stack([x, y], axis=1)
    f = _np.asarray(faces)
    tri = pts[f]                                    # (F, 3, 2)
    ext = (tri.max(axis=1) - tri.min(axis=1)).max()
    w = int(_np.ceil(ext * slack / 8.0) * 8) + 8
    return int(min(max(w, 16), cap))


class VideoWriter:
    """cv2 MP4 writer (reference VideoWriter, lib/model2video.py:132-177)."""

    def __init__(self, path: str, fps: float = 30.0,
                 size: Tuple[int, int] = (DEFAULT_SIZE, DEFAULT_SIZE)):
        import cv2
        self._cv2 = cv2
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(path, fourcc, fps, size)
        self.path = path

    def write(self, frame: np.ndarray) -> None:
        """frame: (H, W, 3) RGB — float in [0,1] or uint8."""
        self.writer.write(quantize_u8(frame)[:, :, ::-1])  # RGB -> BGR

    def write_i420(self, planes: np.ndarray) -> None:
        """planes: (H*3//2, W) uint8 planar I420 (rgb_to_i420 layout)."""
        self.writer.write(self._cv2.cvtColor(
            np.ascontiguousarray(planes), self._cv2.COLOR_YUV2BGR_I420))

    def close(self) -> None:
        self.writer.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def quantize_u8(img: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with round-half-up — the SAME rule the device
    kernel applies (render_frames_tiled: ``*255+0.5``), so frames
    quantized on host (fragment path, crop canvases) are bit-identical
    to device-quantized ones.  uint8 input passes through."""
    a = np.asarray(img)
    if a.dtype == np.uint8:
        return a
    return (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
