"""SRHandNet official two-stage multi-hand pyramid inference, TPU-native.

Re-designs the reference demo loop
(models/pose_estimation/SRHandNet/official_code.py:28-213) as two
fixed-shape jitted programs instead of per-hand python/cv2 loops:

  stage 1 (detect_bbox): the full frame is aspect-preserving-resized into
    the net input (top-left aligned, zero pad), one forward pass; the last
    three channels of the finest output are the region map; peaks of the
    center channel (3x3 max-pool NMS, threshold) give up to `max_hands`
    candidates; the 5x5 mean of the w/h ratio channels around each peak
    sizes the boxes, mapped back to frame coords.
  stage 2 (detect_hand): every candidate box is cropped from the frame by a
    bilinear gather with a per-box affine (the dynamic cv2 crop+resize of
    the reference, but batched and static-shape), one batched forward pass;
    each keypoint channel's peak above `hand_thr` maps back to frame coords.
  pruning: hands with more than 5 missing keypoints are dropped
    (official_code.py:149-157) — here via the validity mask.

Everything returns padded fixed-size arrays + masks, so both stages compile
once per frame shape.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _nms_peaks(hm: jnp.ndarray, k: int, threshold: float):
    """Top-k local maxima of a 2-D map (5x5 max-pool NMS — skimage
    peak_local_max(min_distance=2) semantics, the reference's
    official_code.py:52)."""
    H, W = hm.shape
    pooled = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME"
    )
    # strict threshold + exclude_border=True excludes min_distance=2 pixels
    is_peak = (hm >= pooled) & (hm > threshold)
    border = jnp.zeros_like(hm, bool).at[2:-2, 2:-2].set(True)
    scores = jnp.where(is_peak & border, hm, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(scores, k)
    ys, xs = idx // W, idx % W
    return vals, ys, xs


def _resize_into(frame_f32: jnp.ndarray, rect_xywh, out_hw: Tuple[int, int]):
    """Aspect-preserving top-left-aligned resize of a frame region into a
    fixed canvas via bilinear gather (transform_net_input semantics:
    ratio = min(outH/h, outW/w), zero padding). Returns (canvas, ratio)."""
    H, W = out_hw
    x0, y0, w, h = rect_xywh
    ratio = jnp.minimum(H / jnp.maximum(h, 1e-6), W / jnp.maximum(w, 1e-6))
    ys = jnp.arange(H, dtype=jnp.float32) / ratio + y0
    xs = jnp.arange(W, dtype=jnp.float32) / ratio + x0
    # bilinear taps with zero outside the rect
    H0, W0, _ = frame_f32.shape
    yf = jnp.clip(ys, 0.0, H0 - 1.0)
    xf = jnp.clip(xs, 0.0, W0 - 1.0)
    yi0 = jnp.floor(yf).astype(jnp.int32)
    xi0 = jnp.floor(xf).astype(jnp.int32)
    yi1 = jnp.minimum(yi0 + 1, H0 - 1)
    xi1 = jnp.minimum(xi0 + 1, W0 - 1)
    dy = (yf - yi0)[:, None, None]
    dx = (xf - xi0)[None, :, None]
    g = frame_f32
    top = g[yi0][:, xi0] * (1 - dx) + g[yi0][:, xi1] * dx
    bot = g[yi1][:, xi0] * (1 - dx) + g[yi1][:, xi1] * dx
    out = top * (1 - dy) + bot * dy
    # zero out beyond the source extent (the reference's implicit zero pad)
    valid_y = (ys < y0 + h) & (ys < H0)
    valid_x = (xs < x0 + w) & (xs < W0)
    out = out * valid_y[:, None, None] * valid_x[None, :, None]
    return out, ratio


class SRHandNetPyramid:
    """Two-stage multi-hand inference driver.

    Args:
        model: SRHandNet flax module (4-scale outputs, K+3 channels).
        input_hw: net input (H, W) — the reference trains at 256x256.
        max_hands: static candidate budget per frame.
        det_thr: center-map peak threshold (reference LABEL_MIN).
        hand_thr: keypoint peak threshold (reference LABEL_HAND_MIN).
    """

    def __init__(self, model, variables, input_hw=(256, 256), max_hands=4,
                 det_thr=0.25, hand_thr=0.2, num_joints=21):
        self.model = model
        self.variables = variables
        self.input_hw = tuple(input_hw)
        self.max_hands = int(max_hands)
        self.det_thr = float(det_thr)
        self.hand_thr = float(hand_thr)
        self.K = int(num_joints)
        self._detect = jax.jit(self._detect_bbox)
        self._hands = jax.jit(self._detect_hands)

    # stage 1 -------------------------------------------------------------
    def _forward(self, img):
        out = self.model.apply(self.variables, img, train=False)
        return out[-1] if isinstance(out, (tuple, list)) else out

    def _detect_bbox(self, frame_u8):
        H, W = self.input_hw
        frame = frame_u8.astype(jnp.float32) / 255.0 - 0.5
        H0, W0 = frame.shape[0], frame.shape[1]
        net_in, ratio_in = _resize_into(
            frame, (0.0, 0.0, jnp.float32(W0), jnp.float32(H0)), (H, W)
        )
        hm = self._forward(net_in[None])[0]             # [h, w, K+3]
        hh = hm.shape[0]
        ratio_down = H / hh
        center = hm[..., self.K]
        wmap = hm[..., self.K + 1]
        hmap = hm[..., self.K + 2]
        vals, ys, xs = _nms_peaks(center, self.max_hands, self.det_thr)

        # 5x5 window means of the w/h ratio channels (official_code.py:93-101)
        def mean5(m, y, x):
            win = jax.lax.dynamic_slice(
                jnp.pad(m, 2), (y, x), (5, 5)
            )
            cnt = jax.lax.dynamic_slice(
                jnp.pad(jnp.ones_like(m), 2), (y, x), (5, 5)
            )
            return win.sum() / jnp.maximum(cnt.sum(), 1.0)

        rw = jax.vmap(lambda y, x: mean5(wmap, y, x))(ys, xs)
        rh = jax.vmap(lambda y, x: mean5(hmap, y, x))(ys, xs)
        rw = jnp.clip(rw, 0.0, 1.0)
        rh = jnp.clip(rh, 0.0, 1.0)
        ratio = ratio_down / ratio_in
        cy = ys.astype(jnp.float32) * ratio
        cx = xs.astype(jnp.float32) * ratio
        rect_w = rw * W / ratio_in
        rect_h = rh * H / ratio_in
        left = jnp.clip(cx - rect_w / 2.0, 0.0, W0 - 1.0)
        top = jnp.clip(cy - rect_h / 2.0, 0.0, H0 - 1.0)
        right = jnp.clip(cx + rect_w / 2.0, 0.0, W0 - 1.0)
        bottom = jnp.clip(cy + rect_h / 2.0, 0.0, H0 - 1.0)
        rects = jnp.stack(
            [left, top, right - left, bottom - top], axis=1
        )  # [max_hands, 4] xywh in frame coords
        valid = jnp.isfinite(vals) & (vals >= self.det_thr) \
            & (rects[:, 2] > 1) & (rects[:, 3] > 1)
        return rects, valid, vals

    # stage 2 -------------------------------------------------------------
    def _detect_hands(self, frame_u8, rects):
        H, W = self.input_hw
        frame = frame_u8.astype(jnp.float32) / 255.0 - 0.5

        def one(rect):
            crop, ratio = _resize_into(
                frame, (rect[0], rect[1], rect[2], rect[3]), (H, W)
            )
            return crop, ratio

        crops, ratios = jax.vmap(one)(rects)
        hms = self._forward(crops)[..., : self.K]     # [N, h, w, K]
        hh = hms.shape[1]
        ratio_down = H / hh

        def decode(hm_k, ratio, rect):
            vals, ys, xs = _nms_peaks(hm_k, 1, self.hand_thr)
            scale = ratio_down / ratio
            x = xs[0].astype(jnp.float32) * scale + rect[0]
            y = ys[0].astype(jnp.float32) * scale + rect[1]
            return jnp.stack([x, y]), vals[0]

        def per_hand(hm, ratio, rect):
            coords, scores = jax.vmap(
                lambda k: decode(hm[..., k], ratio, rect)
            )(jnp.arange(self.K))
            return coords, scores

        coords, scores = jax.vmap(per_hand)(hms, ratios, rects)
        found = jnp.isfinite(scores) & (scores >= self.hand_thr)
        return coords, found

    # driver ---------------------------------------------------------------
    def __call__(self, frame_u8):
        """Full pyramid inference on one frame.

        Returns:
            keypoints [max_hands, K, 2] (x, y in frame coords),
            kpt_found [max_hands, K] bool,
            rects [max_hands, 4] (x, y, w, h),
            hand_valid [max_hands] bool (detected AND <=5 missing keypoints,
                official_code.py:149-157).
        """
        frame_u8 = jnp.asarray(frame_u8)
        rects, valid, _ = self._detect(frame_u8)
        coords, found = self._hands(frame_u8, rects)
        found = found & valid[:, None]
        missing = (~found).sum(axis=1)
        hand_valid = np.asarray(valid & (missing <= 5))
        return (
            np.asarray(coords), np.asarray(found),
            np.asarray(rects), hand_valid,
        )
