"""Batched heatmap / SimDR decoding.

Re-implements the reference decode stack
(utils/post_processing/evaluation/top_down_eval.py:199-500) without the
per-(N, K) python loops: argmax, ±0.25 gradient-sign shift, DARK Taylor
refinement (classic and UDP variants), and SimDR vector decode — each as a
single jit-able batched expression using gathers over [B, H, W, K] maps.

Layout: heatmaps are channels-last [B, H, W, K].
"""

from __future__ import annotations

import jax.numpy as jnp

from litehandnet_tpu.ops.affine import transform_preds
from litehandnet_tpu.ops.blur import gaussian_blur


def argmax_coords(heatmaps: jnp.ndarray):
    """Argmax decode (reference: top_down_eval.py:199-231).

    Args:
        heatmaps: [B, H, W, K].

    Returns:
        (preds [B, K, 2] float32 (x, y; -1 where max <= 0),
         maxvals [B, K, 1] float32)
    """
    B, H, W, K = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, K)
    idx = jnp.argmax(flat, axis=1)                      # [B, K]
    maxvals = jnp.max(flat, axis=1)[..., None]          # [B, K, 1]
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    preds = jnp.stack([x, y], axis=-1)
    preds = jnp.where(maxvals > 0.0, preds, -1.0)
    return preds, maxvals


def _gather_hm(flat: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, W: int):
    """Gather per-(B, K) heatmap values at integer coords.

    Args:
        flat: [B, H*W, K] flattened heatmaps.
        ix, iy: [B, K] int32 coords (caller must ensure validity/clipping).

    Returns:
        [B, K] gathered values.
    """
    idx = (iy * W + ix)[:, None, :]  # [B, 1, K]
    return jnp.take_along_axis(flat, idx, axis=1)[:, 0, :]


def refine_default(heatmaps: jnp.ndarray, preds: jnp.ndarray) -> jnp.ndarray:
    """±0.25 shift toward the gradient sign (reference: top_down_eval.py:440-452).

    Applied only for strictly interior maxima (1 < p < size-1).
    """
    B, H, W, K = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, K)
    px = jnp.trunc(preds[..., 0]).astype(jnp.int32)
    py = jnp.trunc(preds[..., 1]).astype(jnp.int32)
    interior = (px > 1) & (px < W - 1) & (py > 1) & (py < H - 1)
    pxc = jnp.clip(px, 1, W - 2)
    pyc = jnp.clip(py, 1, H - 2)
    dx = _gather_hm(flat, pxc + 1, pyc, W) - _gather_hm(flat, pxc - 1, pyc, W)
    dy = _gather_hm(flat, pxc, pyc + 1, W) - _gather_hm(flat, pxc, pyc - 1, W)
    shift = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return preds + shift * interior.astype(jnp.float32)[..., None]


def refine_offset_gen1(
    heatmaps: jnp.ndarray, preds: jnp.ndarray, half_shift: bool = True
) -> jnp.ndarray:
    """Gen-1 ±0.25 refinement (reference heatmap_post_processing.py:6-33,
    adjust_keypoints_by_offset): neighbor lookups CLAMP at the border (the
    shift applies everywhere, unlike refine_default's interior-only gate)
    and both coordinates gain an unconditional +0.5 pixel-center shift.
    half_shift=False gives the HeatmapParser.adjust_keypoints variant
    (HeatmapParser.py:197-223): same clamped ±0.25, no +0.5.
    """
    B, H, W, K = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, K)
    px = jnp.clip(jnp.trunc(preds[..., 0]).astype(jnp.int32), 0, W - 1)
    py = jnp.clip(jnp.trunc(preds[..., 1]).astype(jnp.int32), 0, H - 1)
    right = _gather_hm(flat, jnp.minimum(px + 1, W - 1), py, W)
    left = _gather_hm(flat, jnp.maximum(px - 1, 0), py, W)
    down = _gather_hm(flat, px, jnp.minimum(py + 1, H - 1), W)
    up = _gather_hm(flat, px, jnp.maximum(py - 1, 0), W)
    half = 0.5 if half_shift else 0.0
    sx = jnp.where(right > left, 0.25, -0.25) + half
    sy = jnp.where(down > up, 0.25, -0.25) + half
    return preds + jnp.stack([sx, sy], axis=-1)


def refine_dark(
    heatmaps: jnp.ndarray, preds: jnp.ndarray, kernel: int = 11
) -> jnp.ndarray:
    """Classic DARK refinement: blur + log + one Newton step on a Taylor
    expansion (reference: top_down_eval.py:233-272 and :338-372).

    Applied only where 1 < p < size-2 and the Hessian is non-singular.
    """
    B, H, W, K = heatmaps.shape
    hm = gaussian_blur(heatmaps, kernel, border="constant", preserve_max=True)
    hm = jnp.log(jnp.maximum(hm, 1e-10))
    flat = hm.reshape(B, H * W, K)

    px = jnp.trunc(preds[..., 0]).astype(jnp.int32)
    py = jnp.trunc(preds[..., 1]).astype(jnp.int32)
    interior = (px > 1) & (px < W - 2) & (py > 1) & (py < H - 2)
    px = jnp.clip(px, 2, W - 3)
    py = jnp.clip(py, 2, H - 3)

    v = lambda dx_, dy_: _gather_hm(flat, px + dx_, py + dy_, W)
    dx = 0.5 * (v(1, 0) - v(-1, 0))
    dy = 0.5 * (v(0, 1) - v(0, -1))
    dxx = 0.25 * (v(2, 0) - 2.0 * v(0, 0) + v(-2, 0))
    dyy = 0.25 * (v(0, 2) - 2.0 * v(0, 0) + v(0, -2))
    dxy = 0.25 * (v(1, 1) - v(1, -1) - v(-1, 1) + v(-1, -1))

    det = dxx * dyy - dxy * dxy
    safe_det = jnp.where(det == 0.0, 1.0, det)
    # offset = -H^{-1} @ [dx, dy]
    off_x = -(dyy * dx - dxy * dy) / safe_det
    off_y = -(-dxy * dx + dxx * dy) / safe_det
    valid = (interior & (det != 0.0)).astype(jnp.float32)[..., None]
    offset = jnp.stack([off_x, off_y], axis=-1) * valid
    return preds + offset


def refine_dark_udp(
    heatmaps: jnp.ndarray, preds: jnp.ndarray, kernel: int = 3
) -> jnp.ndarray:
    """UDP-style DARK refinement (reference: post_dark_udp,
    top_down_eval.py:274-335): reflect-101 blur, clip+log, edge-pad, 3x3
    finite differences, eps-regularized 2x2 Hessian solve.
    """
    B, H, W, K = heatmaps.shape
    hm = gaussian_blur(heatmaps, kernel, border="reflect")
    hm = jnp.log(jnp.clip(hm, 0.001, 50.0))
    hm = jnp.pad(hm, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    Wp = W + 2
    flat = hm.reshape(B, (H + 2) * Wp, K)

    px = jnp.trunc(preds[..., 0]).astype(jnp.int32) + 1
    py = jnp.trunc(preds[..., 1]).astype(jnp.int32) + 1
    v = lambda dx_, dy_: _gather_hm(flat, px + dx_, py + dy_, Wp)

    i0 = v(0, 0)
    dx = 0.5 * (v(1, 0) - v(-1, 0))
    dy = 0.5 * (v(0, 1) - v(0, -1))
    dxx = v(1, 0) - 2.0 * i0 + v(-1, 0)
    dyy = v(0, 1) - 2.0 * i0 + v(0, -1)
    dxy = 0.5 * (v(1, 1) - v(1, 0) - v(0, 1) + 2.0 * i0 - v(-1, 0) - v(0, -1) + v(-1, -1))

    eps = jnp.float32(jnp.finfo(jnp.float32).eps)
    a = dxx + eps
    b = dxy
    c = dyy + eps
    det = a * c - b * b
    safe_det = jnp.where(det == 0.0, 1.0, det)
    off_x = (c * dx - b * dy) / safe_det
    off_y = (-b * dx + a * dy) / safe_det
    offset = jnp.stack([off_x, off_y], axis=-1)
    return preds - offset


def keypoints_from_heatmaps(
    heatmaps: jnp.ndarray,
    center: jnp.ndarray,
    scale: jnp.ndarray,
    post_process: str | None = "default",
    kernel: int = 11,
    use_udp: bool = False,
):
    """Full decode: argmax + sub-pixel refinement + unwarp to image coords.

    Batched equivalent of reference top_down_eval.py:375-463.

    Args:
        heatmaps: [B, H, W, K] (channels-last).
        center: [B, 2] bbox centers.
        scale: [B, 2] bbox scales (/200).
        post_process: None | 'default' | 'unbiased' (DARK).
        kernel: DARK modulation kernel.
        use_udp: UDP decode path (post_dark_udp + UDP unwarp).

    Returns:
        (hm_preds [B, K, 2] heatmap-space coords,
         preds [B, K, 2] image-space coords,
         maxvals [B, K, 1])
    """
    _, H, W, _ = heatmaps.shape
    hm_preds, maxvals = argmax_coords(heatmaps)
    if use_udp:
        hm_preds = refine_dark_udp(heatmaps, hm_preds, kernel=kernel)
    elif post_process == "unbiased":
        hm_preds = refine_dark(heatmaps, hm_preds, kernel=kernel)
    elif post_process is not None:
        hm_preds = refine_default(heatmaps, hm_preds)
    preds = transform_preds(hm_preds, center, scale, (W, H), use_udp=use_udp)
    return hm_preds, preds, maxvals


def keypoints_from_simdr(
    x_vectors: jnp.ndarray,
    y_vectors: jnp.ndarray,
    center: jnp.ndarray,
    scale: jnp.ndarray,
    split_ratio: int = 2,
):
    """Decode SimDR 1-D vectors (reference: top_down_eval.py:466-500).

    Args:
        x_vectors: [B, K, W*k].
        y_vectors: [B, K, H*k].
        center, scale: [B, 2] unwarp parameters.
        split_ratio: SimDR split ratio k.

    Returns:
        [B, K, 3] (x, y, score) in image coords.
    """
    k = int(split_ratio)
    Wk = x_vectors.shape[-1]
    Hk = y_vectors.shape[-1]
    x_idx = jnp.argmax(x_vectors, axis=-1).astype(jnp.float32)
    y_idx = jnp.argmax(y_vectors, axis=-1).astype(jnp.float32)
    x_max = jnp.max(x_vectors, axis=-1)
    y_max = jnp.max(y_vectors, axis=-1)
    preds = jnp.stack([x_idx, y_idx], axis=-1) / float(k)
    scores = ((x_max + y_max) / 2.0)[..., None]
    preds = transform_preds(
        preds, center, scale, (Wk // k, Hk // k), use_udp=False
    )
    return jnp.concatenate([preds, scores], axis=-1)
