"""Silhouette warp stage: SMPL-rendered value maps -> photo silhouette.

Capability parity with the reference Warp stage (lib/Warp.py:17-46):
  1. extract ordered boundaries of the photo mask and the SMPL value-map
     silhouette,
  2. match the boundaries (monotone DP),
  3. move every SMPL-interior pixel with mean-value coordinates w.r.t. the
     matched boundary polygon,
  4. scatter the (H, W, C) value map to the warped positions,
  5. fill holes and smooth.

TPU-first redesign of step 5: the reference fills holes with a per-pixel
python loop (8-neighbor MVC + sklearn 1-NN fallback + box/median smoothing,
lib/Warp.py:354-456).  Here hole filling is a *fixed-point masked diffusion*:
every unfilled mask pixel repeatedly takes the mean of its filled 3x3
neighbors until the mask is saturated (``lax.while_loop``, early exit).
The limit of this iteration reproduces both the MVC-average interior fill
and the nearest-neighbor edge fill of the reference in one vectorized op.
"""
from __future__ import annotations

import contextlib
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpubody.image import boundary_match, contours, morphology, mvc


def _sub(timer, name: str):
    """Substage context: times + device-syncs when a timer is passed,
    free (nullcontext, no block_until_ready) otherwise."""
    return timer.stage(name) if timer is not None else contextlib.nullcontext()


class WarpResult(NamedTuple):
    value: jnp.ndarray        # (H, W, C) warped + filled value map
    warped_raw: jnp.ndarray   # (H, W, C) before hole filling
    match: np.ndarray         # (m,) matched smpl-boundary indices
    rgb_bound: np.ndarray     # (m, 2)
    smpl_bound: np.ndarray    # (n, 2)


def silhouette_from_value(value: jnp.ndarray) -> jnp.ndarray:
    """Foreground mask of a rendered value map: background is where the
    front OR back normal channels are the all-ones clear color
    (reference lib/Warp.py:24)."""
    front_clear = jnp.all(value[..., 0:3] == 1.0, axis=-1)
    back_clear = jnp.all(value[..., 3:6] == 1.0, axis=-1)
    return ~(front_clear | back_clear)


@functools.partial(jax.jit, donate_argnums=())
def scatter_warp(value: jnp.ndarray, src_pts: jnp.ndarray,
                 dst_pts: jnp.ndarray) -> jnp.ndarray:
    """Scatter value[src] -> out[dst] with bounds clipping
    (reference warp_map, lib/Warp.py:220-248).

    src_pts/dst_pts: (n, 2) as (x, y).
    """
    H, W = value.shape[:2]
    dst = jnp.round(dst_pts).astype(jnp.int32)
    x = jnp.clip(dst[:, 0], 0, W - 1)
    y = jnp.clip(dst[:, 1], 0, H - 1)
    src = src_pts.astype(jnp.int32)
    vals = value[src[:, 1], src[:, 0], :]
    out = jnp.zeros_like(value)
    return out.at[y, x, :].set(vals)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _fill_holes_full(value: jnp.ndarray, mask: jnp.ndarray,
                     max_iters: int = 512):
    """fill_holes returning (img, iterations) — see fill_holes."""
    m = mask.astype(jnp.bool_)
    filled0 = (jnp.sum(jnp.abs(value), axis=-1) > 0) & m

    def cond(state):
        _, filled, it = state
        return (it < max_iters) & jnp.any(m & ~filled)

    def body(state):
        img, filled, it = state
        fm = filled.astype(img.dtype)
        num = morphology.box_blur(img * fm[..., None], 3)
        den = morphology.box_blur(fm, 3)
        can_fill = m & ~filled & (den > 1e-8)
        newvals = num / jnp.maximum(den, 1e-8)[..., None]
        img = jnp.where(can_fill[..., None], newvals, img)
        return img, filled | can_fill, it + 1

    img, _, it = jax.lax.while_loop(cond, body, (value, filled0, 0))
    return img, it


def fill_holes(value: jnp.ndarray, mask: jnp.ndarray,
               max_iters: int = 512) -> jnp.ndarray:
    """Fixed-point diffusion fill: unfilled mask pixels take the mean of
    filled 3x3 neighbors; iterate until saturated."""
    return _fill_holes_full(value, mask, max_iters)[0]


@jax.jit
def fill_holes_pyramid(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pull-push hole fill: O(log n) fixed passes instead of the
    diffusion fill's data-dependent while_loop (up to 512 sequential
    3x3 passes over the full H x W x C block — the warp stage's
    dominant device cost at 1024^2 x 30).

    Pull builds masked 2x2-mean levels; push fills each level's holes
    from the next-coarser level.  Same contract as ``fill_holes``
    (unfilled mask pixels get neighborhood-consistent values, everything
    else passes through; replaces the reference's sklearn 1-NN edge fill,
    lib/Warp.py:43-46) — values differ from the diffusion fixed point but
    stay in the local value range, and the warp stage's masked box smooth
    runs after either fill.
    """
    m = mask.astype(jnp.bool_)
    filled0 = (jnp.sum(jnp.abs(value), axis=-1) > 0) & m
    v = jnp.where(filled0[..., None], value, 0.0)
    w = filled0.astype(value.dtype)
    H, W = int(v.shape[0]), int(v.shape[1])

    levels = []
    while H > 1 or W > 1:
        levels.append((v, w))
        H2, W2 = (H + 1) // 2, (W + 1) // 2
        v = jnp.pad(v, ((0, H2 * 2 - H), (0, W2 * 2 - W), (0, 0)))
        w = jnp.pad(w, ((0, H2 * 2 - H), (0, W2 * 2 - W)))
        vs = (v * w[..., None]).reshape(H2, 2, W2, 2, -1).sum(axis=(1, 3))
        ws = w.reshape(H2, 2, W2, 2).sum(axis=(1, 3))
        v = vs / jnp.maximum(ws, 1.0)[..., None]
        w = (ws > 0).astype(value.dtype)
        H, W = H2, W2

    for vf, wf in reversed(levels):
        Hf, Wf = int(vf.shape[0]), int(vf.shape[1])
        up = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1)[:Hf, :Wf]
        v = jnp.where(wf[..., None] > 0, vf, up)

    return jnp.where(filled0[..., None], value,
                     jnp.where(m[..., None], v, value))


@jax.jit
def smooth_filled(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """One masked 3x3 mean pass over the filled map (reference's box
    smoothing loop, lib/Warp.py:424-445)."""
    out = morphology.masked_box_smooth(value, mask, 3)
    return jnp.where(mask[..., None], out, value)


@jax.jit
def smooth_weight_channels(value: jnp.ndarray) -> jnp.ndarray:
    """Median(5) + box(3) + median(3) over the 24 skinning-weight channels
    (channels 6:, reference lib/Warp.py:441-450), vectorized over all
    channels at once instead of 8 separate 3-channel cv2 calls."""
    w = value[..., 6:]
    w = morphology.median_blur(w, 5)
    w = morphology.box_blur(w, 3)
    w = morphology.median_blur(w, 3)
    return jnp.concatenate([value[..., :6], w], axis=-1)


def warp_stage(
    rgb_mask: np.ndarray,
    smplh_value,
    k: int = 64,
    smooth_weights: bool = True,
    fill: str = "pyramid",
    timer=None,
) -> WarpResult:
    """Full warp stage (reference Wrap.__call__, lib/Warp.py:28-46).

    Args:
      rgb_mask: (H, W) photo silhouette (nonzero = person).
      smplh_value: (H, W, C>=6) rendered SMPL value map (front/back normals
        + skinning weights), background = 1.0 in the normal channels.
        Accepts a device array — the value block then never crosses the
        host boundary (it is ~126 MB at 1024^2x30).
      timer: optional StageTimer for substage attribution (adds
        block_until_ready syncs; leave None in production).
    """
    with _sub(timer, "warp/to_device"):
        value = jnp.asarray(smplh_value, jnp.float32)
        if timer is not None:
            value.block_until_ready()
    with _sub(timer, "warp/silhouette"):
        smpl_mask = np.asarray(silhouette_from_value(value))

    # Host: ordered boundary polygons (data-dependent lengths).
    with _sub(timer, "warp/contours"):
        rgb_contour = contours.trace_boundary(rgb_mask)
        rgb_bound = contours.simplify(rgb_contour)
        smpl_bound = contours.trace_boundary(smpl_mask)
        if rgb_bound.shape[0] < 4 or smpl_bound.shape[0] < 4:
            raise ValueError(
                "warp_stage: degenerate silhouette (photo mask "
                f"{rgb_bound.shape[0]} pts, rendered mask "
                f"{smpl_bound.shape[0]} pts) — check the mask and value map")

    # Device: monotone DP match.
    with _sub(timer, "warp/match"):
        match = boundary_match.match_boundaries(smpl_bound, rgb_bound, k=k)
        smpl_bound_matched = smpl_bound[match]

    # Device: MVC transport of all interior pixels.
    with _sub(timer, "warp/inner_points"):
        inner = contours.inner_points(smpl_mask)
    with _sub(timer, "warp/mvc"):
        warp_fn = (mvc.warp_points_chunked if inner.shape[0] > 65536
                   else mvc.warp_points)
        warped = warp_fn(
            jnp.asarray(inner, jnp.float32),
            jnp.asarray(smpl_bound_matched, jnp.float32),
            jnp.asarray(rgb_bound, jnp.float32))
        if timer is not None:
            warped.block_until_ready()

    with _sub(timer, "warp/scatter"):
        raw = scatter_warp(value, jnp.asarray(inner), warped)
        if timer is not None:
            raw.block_until_ready()

    mask = jnp.asarray(np.asarray(rgb_mask) != 0)
    with _sub(timer, "warp/fill_holes"):
        if fill == "pyramid":
            filled = fill_holes_pyramid(raw, mask)
        else:
            filled, fill_iters = _fill_holes_full(raw, mask)
            if timer is not None:
                timer.records.append({"stage": "warp/fill_holes_iters",
                                      "seconds": int(fill_iters)})
        if timer is not None:
            filled.block_until_ready()
    with _sub(timer, "warp/smooth"):
        filled = smooth_filled(filled, mask)
        if smooth_weights and value.shape[-1] > 6:
            filled = smooth_weight_channels(filled)
        filled = jnp.where(mask[..., None], filled, 0.0)
        if timer is not None:
            filled.block_until_ready()
    return WarpResult(
        value=filled, warped_raw=raw, match=match,
        rgb_bound=rgb_bound, smpl_bound=smpl_bound)
