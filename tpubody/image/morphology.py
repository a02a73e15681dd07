"""Binary morphology and blurs as XLA reduce-window / convolution ops.

Replaces the cv2 calls sprinkled through the reference pipeline
(cv2.erode lib/Normal2Depth.py:18, cv2.morphologyEx MORPH_CLOSE
:548, medianBlur/blur lib/Warp.py:441-450) with jit/vmap-friendly
TPU ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _window(x: jnp.ndarray, ksize: int, op, init):
    pad = ksize // 2
    return jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(ksize, ksize),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    )


def erode(mask: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Binary/greyscale erosion with a ksize x ksize box element."""
    m = mask.astype(jnp.float32)
    return _window(m, ksize, jax.lax.min, jnp.inf).astype(mask.dtype)


def dilate(mask: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    return _window(m, ksize, jax.lax.max, -jnp.inf).astype(mask.dtype)


def close(mask: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Morphological closing (dilate then erode; cv2.MORPH_CLOSE)."""
    return erode(dilate(mask, ksize), ksize)


def open_(mask: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    return dilate(erode(mask, ksize), ksize)


def boundary(mask: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Inner boundary ring: mask minus its erosion."""
    m = mask.astype(jnp.bool_)
    return m & ~erode(m, ksize).astype(jnp.bool_)


def box_blur(img: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Mean filter over a ksize box; channels handled independently.
    img (H, W) or (H, W, C)."""
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    x = jnp.moveaxis(x, -1, 0)[:, None]                # (C, 1, H, W)
    k = jnp.ones((1, 1, ksize, ksize), x.dtype) / (ksize * ksize)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(ksize // 2, ksize // 2)] * 2)
    y = jnp.moveaxis(y[:, 0], 0, -1)
    return y[..., 0] if squeeze else y


def median_blur(img: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Median filter (exact, via sort over the unrolled window).

    ksize is expected small (3/5, as in the reference's medianBlur use
    lib/Warp.py:441).  The k^2-shifted-copies stack is materialized per
    CHANNEL via ``lax.map`` — at 1024^2 x 24 channels the full stack would
    be k^2 * 100MB of HBM temporaries (OOMs the chip); per-channel it is
    bounded at k^2 * H * W floats.
    """
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    pad = ksize // 2
    H, W = x.shape[:2]

    def one_channel(ch):   # (H, W)
        xp = jnp.pad(ch, ((pad, pad), (pad, pad)), mode="edge")
        shifts = [xp[dy:dy + H, dx:dx + W] for dy in range(ksize)
                  for dx in range(ksize)]
        stack = jnp.stack(shifts, axis=0)
        return jnp.sort(stack, axis=0)[(ksize * ksize) // 2]

    med = jax.lax.map(one_channel, jnp.moveaxis(x, -1, 0))
    med = jnp.moveaxis(med, 0, -1)
    return med[..., 0] if squeeze else med


def masked_box_smooth(img: jnp.ndarray, mask: jnp.ndarray,
                      ksize: int = 3) -> jnp.ndarray:
    """Box blur that averages only over valid (mask) pixels."""
    m = mask.astype(img.dtype)
    num = box_blur(img * (m[..., None] if img.ndim == 3 else m), ksize)
    den = box_blur(m, ksize)
    den = jnp.maximum(den, 1e-8)
    return num / (den[..., None] if img.ndim == 3 else den)
