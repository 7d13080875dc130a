"""CenterNet-style utilities: letterbox, pooled NMS, bbox decode, gaussian
targets (reference: utils/utils_centermap.py:8-234), numpy/jnp NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def letterbox(image: np.ndarray, size) -> np.ndarray:
    """Resize keeping aspect ratio, pad with gray (reference :8-30)."""
    from PIL import Image

    w, h = size
    ih, iw = image.shape[:2]
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    resized = np.asarray(
        Image.fromarray(image).resize((nw, nh), Image.BICUBIC)
    )
    canvas = np.full((h, w, 3), 128, np.uint8)
    dx, dy = (w - nw) // 2, (h - nh) // 2
    canvas[dy:dy + nh, dx:dx + nw] = resized
    return canvas


def pool_nms(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Max-pool peak NMS on [B, H, W, C] (reference :33-37)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return jnp.where(hmax == heat, heat, 0.0)


def decode_bbox(center_heat, wh_map, offset_map, confidence=0.3,
                max_out: int = 100):
    """CenterNet bbox decode (reference :40-100): peak NMS -> top-k centers
    -> wh + offset reads -> normalized (x1, y1, x2, y2, conf). Fixed-size
    padded output [B, max_out, 5].
    """
    B, H, W, _ = center_heat.shape
    heat = pool_nms(center_heat)[..., 0].reshape(B, H * W)
    top_val, top_idx = jax.lax.top_k(heat, max_out)
    xs = (top_idx % W).astype(jnp.float32)
    ys = (top_idx // W).astype(jnp.float32)

    flat_wh = wh_map.reshape(B, H * W, 2)
    flat_off = offset_map.reshape(B, H * W, 2)
    wh = jnp.take_along_axis(flat_wh, top_idx[..., None], axis=1)
    off = jnp.take_along_axis(flat_off, top_idx[..., None], axis=1)
    cx = (xs + off[..., 0]) / W
    cy = (ys + off[..., 1]) / H
    w = wh[..., 0] / W
    h = wh[..., 1] / H
    conf = jnp.where(top_val > confidence, top_val, 0.0)
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, conf], axis=-1
    )


def gaussian_radius(det_size, min_overlap=0.7) -> int:
    """Minimal gaussian radius keeping IoU >= min_overlap
    (reference :211-234, including its max(0, int(...)) truncation —
    draw_gaussian consumes an integer radius)."""
    height, width = det_size
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(b1**2 - 4 * a1 * c1)) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + np.sqrt(b2**2 - 4 * a2 * c2)) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / 2
    return max(0, int(min(r1, r2, r3)))


def draw_gaussian(heatmap: np.ndarray, center, radius: int, k: float = 1.0):
    """Paint a clipped gaussian in-place (reference :174-210)."""
    diameter = 2 * radius + 1
    sigma = diameter / 6
    y, x = np.ogrid[-radius:radius + 1, -radius:radius + 1]
    gaussian = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    gaussian[gaussian < np.finfo(gaussian.dtype).eps * gaussian.max()] = 0

    cx, cy = int(center[0]), int(center[1])
    H, W = heatmap.shape
    left, right = min(cx, radius), min(W - cx, radius + 1)
    top, bottom = min(cy, radius), min(H - cy, radius + 1)
    masked_hm = heatmap[cy - top:cy + bottom, cx - left:cx + right]
    masked_g = gaussian[radius - top:radius + bottom,
                        radius - left:radius + right]
    if min(masked_g.shape) > 0 and min(masked_hm.shape) > 0:
        np.maximum(masked_hm, masked_g * k, out=masked_hm)
    return heatmap
