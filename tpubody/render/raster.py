"""TPU-native triangle rasterizer (replaces opendr + open3d offscreen).

The reference rasterizes per-vertex normals, 24-channel skinning weights and
shaded animation frames through C++ renderers (utils/render_model.py:17-121
via opendr; lib/model2video.py:226-309 via open3d).  TPUs have no raster
unit, so this module implements rasterization as pure XLA ops, designed
around what TPUs are good at (dense vectorized math, scatter/gather) and
what they lack (no warp-level triangle setup):

  Pass 1 — *coverage*: every face rasterizes a fixed WINDOW x WINDOW pixel
    footprint anchored at its bbox corner (vectorized over all faces at
    once).  Candidate fragments pack (quantized depth, face id) into a
    single int32 and scatter-min into a flat z-buffer — depth test and
    winner selection in one associative op, no atomics needed.

  Pass 2 — *shading*: per pixel, unpack the winning face id, gather its
    three vertices, recompute exact barycentrics at the pixel center, and
    interpolate an arbitrary K-channel vertex-attribute matrix (normals,
    skinning weights, colors...) in ONE pass — where the reference needed
    8 separate RGB rasterizer passes for 24 weight channels
    (utils/render_model.py:101-110).

Both passes are jit-compatible with static shapes; `vmap` batches over
frames for animation rendering.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = jnp.iinfo(jnp.int32).max


class RasterOutput(NamedTuple):
    attrs: jnp.ndarray    # (H, W, C) interpolated vertex attributes
    depth: jnp.ndarray    # (H, W) interpolated depth (+inf where no hit)
    mask: jnp.ndarray     # (H, W) bool coverage
    face_id: jnp.ndarray  # (H, W) int32 winning face (-1 where no hit)
    bary: jnp.ndarray     # (H, W, 3) barycentric coords of the winner


def _face_bits(n_faces: int) -> int:
    bits = 1
    while (1 << bits) < n_faces + 1:
        bits += 1
    return bits


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "window", "cull_backface",
                     "depth_ascending"),
)
def rasterize(
    verts: jnp.ndarray,     # (V, 3) screen space: x_pix, y_pix, depth
    faces: jnp.ndarray,     # (F, 3) int32 vertex indices
    attrs: jnp.ndarray,     # (V, C) per-vertex attributes to interpolate
    height: int,
    width: int,
    window: int = 64,
    cull_backface: bool = False,
    depth_ascending: bool = True,
) -> RasterOutput:
    """Rasterize a triangle mesh with per-vertex attribute interpolation.

    ``window`` bounds the per-face pixel footprint; faces whose bbox exceeds
    it are clipped (choose window >= max expected face extent in pixels).
    ``depth_ascending=True`` keeps the smallest depth per pixel (camera
    looking down +z).
    """
    F = int(faces.shape[0])
    fb = _face_bits(F)
    depth_levels = 1 << (31 - fb)

    xy = verts[:, :2]
    z = verts[:, 2]
    if not depth_ascending:
        z = -z

    tri = faces.astype(jnp.int32)
    p0, p1, p2 = xy[tri[:, 0]], xy[tri[:, 1]], xy[tri[:, 2]]     # (F, 2)
    z0, z1, z2 = z[tri[:, 0]], z[tri[:, 1]], z[tri[:, 2]]        # (F,)

    # Signed double area (2D cross product of edges).
    area = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - \
           (p2[:, 0] - p0[:, 0]) * (p1[:, 1] - p0[:, 1])
    if cull_backface:
        face_ok = area > 1e-12
    else:
        face_ok = jnp.abs(area) > 1e-12
    inv_area = jnp.where(face_ok, 1.0 / jnp.where(face_ok, area, 1.0), 0.0)

    # Window anchor: integer bbox corner per face, clamped into the screen
    # so the window always covers the visible part of faces whose bbox
    # extends (possibly far) offscreen — an unclamped negative anchor
    # could place the whole lattice outside the frame.  With
    # window >= max(height, width) the clamp guarantees FULL visible
    # coverage regardless of projected bbox size.
    bb_min = jnp.floor(jnp.minimum(jnp.minimum(p0, p1), p2)).astype(jnp.int32)
    hi = jnp.asarray([width - window, height - window], jnp.int32)
    bb_min = jnp.clip(bb_min, jnp.minimum(0, hi), jnp.maximum(0, hi))

    # Candidate pixel lattice: (F, window, window, 2).
    wy = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0)
    wx = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1)
    px = bb_min[:, None, None, 0] + wx[None]
    py = bb_min[:, None, None, 1] + wy[None]
    pcx = px.astype(verts.dtype) + 0.5   # pixel centers
    pcy = py.astype(verts.dtype) + 0.5

    def edge(ax, ay, bx, by):
        # cross(b - a, p - a) for all candidate pixels
        return ((bx - ax)[:, None, None] * (pcy - ay[:, None, None])
                - (pcx - ax[:, None, None]) * (by - ay)[:, None, None])

    w0 = edge(p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1]) * inv_area[:, None, None]
    w1 = edge(p2[:, 0], p2[:, 1], p0[:, 0], p0[:, 1]) * inv_area[:, None, None]
    w2 = edge(p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1]) * inv_area[:, None, None]

    eps = -1e-7
    inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
    inbounds = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    valid = inside & inbounds & face_ok[:, None, None]

    depth = (w0 * z0[:, None, None] + w1 * z1[:, None, None]
             + w2 * z2[:, None, None])

    # Normalize depth into the quantization range using the mesh z extent.
    zmin = jnp.min(z)
    zmax = jnp.max(z)
    dq = jnp.clip(
        ((depth - zmin) / jnp.maximum(zmax - zmin, 1e-12)
         * (depth_levels - 1)).astype(jnp.int32),
        0, depth_levels - 1)

    fid = jax.lax.broadcasted_iota(jnp.int32, (F, window, window), 0)
    packed = (dq << fb) | fid
    packed = jnp.where(valid, packed, INT32_MAX)

    lin = py * width + px
    lin = jnp.where(valid, lin, height * width)  # spill slot

    zbuf = jnp.full((height * width + 1,), INT32_MAX, jnp.int32)
    zbuf = zbuf.at[lin.reshape(-1)].min(packed.reshape(-1))
    zbuf = zbuf[: height * width].reshape(height, width)

    return shade_from_zbuf(zbuf, verts, faces, attrs, height, width,
                           depth_ascending=depth_ascending)


def shade_from_zbuf(
    zbuf: jnp.ndarray,      # (H, W) packed int32 (depth << fb | face)
    verts: jnp.ndarray,     # (V, 3) screen space
    faces: jnp.ndarray,     # (F, 3)
    attrs: jnp.ndarray,     # (V, C)
    height: int,
    width: int,
    depth_ascending: bool = True,
) -> RasterOutput:
    """Pass 2: exact barycentric shading of each pixel's winning face.

    Shared by the XLA fragment path above and the tiled Pallas path
    (render/pallas_raster.py) — both produce the same packed z-buffer."""
    F = int(faces.shape[0])
    fb = _face_bits(F)
    tri = faces.astype(jnp.int32)
    xy = verts[:, :2]
    z = verts[:, 2]
    if not depth_ascending:
        z = -z

    flat = zbuf.reshape(-1)
    hit = flat != INT32_MAX
    win_face = jnp.where(hit, flat & ((1 << fb) - 1), 0)

    gx = (jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
          .reshape(-1).astype(verts.dtype) + 0.5)
    gy = (jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
          .reshape(-1).astype(verts.dtype) + 0.5)

    ftri = tri[win_face]                     # (HW, 3)
    q0, q1, q2 = xy[ftri[:, 0]], xy[ftri[:, 1]], xy[ftri[:, 2]]
    a = ((q1[:, 0] - q0[:, 0]) * (q2[:, 1] - q0[:, 1])
         - (q2[:, 0] - q0[:, 0]) * (q1[:, 1] - q0[:, 1]))
    inv_a = 1.0 / jnp.where(jnp.abs(a) > 1e-12, a, 1.0)

    def edge_px(ax, ay, bx, by):
        return (bx - ax) * (gy - ay) - (gx - ax) * (by - ay)

    b0 = edge_px(q1[:, 0], q1[:, 1], q2[:, 0], q2[:, 1]) * inv_a
    b1 = edge_px(q2[:, 0], q2[:, 1], q0[:, 0], q0[:, 1]) * inv_a
    b2 = 1.0 - b0 - b1
    bary = jnp.stack([b0, b1, b2], axis=-1)
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-12)

    av = (attrs[ftri[:, 0]] * bary[:, 0:1]
          + attrs[ftri[:, 1]] * bary[:, 1:2]
          + attrs[ftri[:, 2]] * bary[:, 2:3])                  # (HW, C)

    zf = z[ftri[:, 0]] * bary[:, 0] + z[ftri[:, 1]] * bary[:, 1] \
        + z[ftri[:, 2]] * bary[:, 2]
    if not depth_ascending:
        zf = -zf

    hitf = hit.astype(av.dtype)[:, None]
    out_attrs = (av * hitf).reshape(height, width, -1)
    out_depth = jnp.where(hit, zf, jnp.inf).reshape(height, width)
    out_face = jnp.where(hit, win_face, -1).reshape(height, width)
    out_bary = (bary * hitf).reshape(height, width, 3)
    return RasterOutput(
        attrs=out_attrs,
        depth=out_depth,
        mask=hit.reshape(height, width),
        face_id=out_face,
        bary=out_bary,
    )


def merge_rasters(a: RasterOutput, b: RasterOutput,
                  b_face_offset: int = 0) -> RasterOutput:
    """Depth-composite two rasterizations of disjoint face sets."""
    b_wins = b.depth < a.depth
    m = b_wins[..., None]
    return RasterOutput(
        attrs=jnp.where(m, b.attrs, a.attrs),
        depth=jnp.where(b_wins, b.depth, a.depth),
        mask=a.mask | b.mask,
        face_id=jnp.where(b_wins, jnp.where(b.face_id >= 0,
                                            b.face_id + b_face_offset, -1),
                          a.face_id),
        bary=jnp.where(m, b.bary, a.bary),
    )


def split_faces_by_extent(
    verts_screen: np.ndarray, faces: np.ndarray, small_window: int,
    pad_multiple: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side face binning for :func:`rasterize_binned`.

    Splits faces into (small, large) by projected bbox extent; each subset
    is padded with degenerate (0,0,0) faces to a multiple of
    ``pad_multiple`` so the compiled shapes are stable across frames.
    """
    v = np.asarray(verts_screen)[:, :2]
    f = np.asarray(faces)
    tri = v[f]
    ext = (tri.max(axis=1) - tri.min(axis=1)).max(axis=1)
    small = f[ext <= small_window - 2]
    large = f[ext > small_window - 2]

    def pad(x):
        n = max(((x.shape[0] + pad_multiple - 1) // pad_multiple)
                * pad_multiple, pad_multiple)
        out = np.zeros((n, 3), f.dtype)
        out[:x.shape[0]] = x
        return out

    return pad(small), pad(large)


def rasterize_binned(
    verts: jnp.ndarray, small_faces: jnp.ndarray, large_faces: jnp.ndarray,
    attrs: jnp.ndarray, height: int, width: int,
    small_window: int = 32, large_window: int = 256,
    depth_ascending: bool = True,
) -> RasterOutput:
    """Two-class rasterization: the many small faces use a tight window
    (fragment count is faces x window^2), the few large ones a big window;
    results depth-composite.  ~4x fewer fragments than one conservative
    window when large faces are rare (they are, for body meshes)."""
    a = rasterize(verts, small_faces, attrs, height, width,
                  window=small_window, depth_ascending=depth_ascending)
    b = rasterize(verts, large_faces, attrs, height, width,
                  window=large_window, depth_ascending=depth_ascending)
    return merge_rasters(a, b, b_face_offset=int(small_faces.shape[0]))


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted per-vertex normals, vectorized (replaces opendr
    VertNormals, utils/render_model.py:36-37).  verts (V,3), faces (F,3)."""
    tri = faces.astype(jnp.int32)
    v0, v1, v2 = verts[tri[:, 0]], verts[tri[:, 1]], verts[tri[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)    # area-weighted face normals
    vn = jnp.zeros_like(verts)
    vn = vn.at[tri[:, 0]].add(fn)
    vn = vn.at[tri[:, 1]].add(fn)
    vn = vn.at[tri[:, 2]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def shade_lambert(
    raster: RasterOutput,
    normals_img: jnp.ndarray,     # (H, W, 3) interpolated normals
    colors_img: jnp.ndarray,      # (H, W, 3) interpolated vertex colors
    light_dir=(0.0, 0.0, -1.0),
    ambient: float = 0.35,
    background: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Simple Lambert shading for animation frames (open3d replacement,
    lib/model2video.py:226-309)."""
    L = jnp.asarray(light_dir, colors_img.dtype)
    L = L / jnp.linalg.norm(L)
    n = normals_img / jnp.maximum(
        jnp.linalg.norm(normals_img, axis=-1, keepdims=True), 1e-12)
    diff = jnp.clip(jnp.abs(jnp.einsum("hwc,c->hw", n, L)), 0.0, 1.0)
    shaded = colors_img * (ambient + (1.0 - ambient) * diff)[..., None]
    if background is not None:
        m = raster.mask[..., None]
        shaded = jnp.where(m, shaded, background)
    return shaded
