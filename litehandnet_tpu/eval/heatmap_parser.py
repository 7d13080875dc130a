"""Bottom-up heatmap parsing with tag-based grouping (Gen-1 lineage).

Reference: utils/HeatmapParser.py:14-223 (HigherHRNet-derived) and the
single-hand variant utils/SPheatmapParser.py:12-240 — center-map candidate
bboxes, then per-bbox keypoint selection where each joint's top-k candidates
are disambiguated by associative-embedding tags (minimum |tag - center_tag|),
plus the +-0.25 offset adjustment.

TPU redesign: the per-bbox python loops become a masked top-k over the full
map per (box, joint) pair inside one jitted program; outputs are fixed-size
[B, max_boxes, K, 4] (x, y, conf, tag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from litehandnet_tpu.config import pcfg
from litehandnet_tpu.ops.detect import (
    candidate_bboxes,
    heatmap_nms,
    masked_nms,
)


@functools.partial(jax.jit, static_argnames=("bbox_k",))
def _group_by_tags(heatmaps, tag_maps, boxes, bbox_factor, feature_stride,
                   bbox_k: int = 8):
    """Per-box, per-joint tag grouping.

    Args:
        heatmaps: [B, H, W, K] peak-NMS'ed joint heatmaps.
        tag_maps: [B, H, W, K] (or [B, H, W, 1] shared) tag embeddings.
        boxes: [B, M, 5] (cx, cy, w, h, conf) in image pixels.

    Returns:
        [B, M, K, 4] (x, y, conf, tag) in heatmap coords.
    """
    B, H, W, K = heatmaps.shape
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    if tag_maps.shape[-1] == 1:
        tag_maps = jnp.broadcast_to(tag_maps, heatmaps.shape)

    def per_box(hm, tags, box):
        cx = box[0] / feature_stride
        cy = box[1] / feature_stride
        w = box[2] * bbox_factor / feature_stride
        h = box[3] * bbox_factor / feature_stride
        mask = (
            (xs >= cx - w / 2) & (xs <= cx + w / 2)
            & (ys >= cy - h / 2) & (ys <= cy + h / 2)
        )
        masked = jnp.where(mask[..., None], hm, -jnp.inf)
        flat = masked.reshape(H * W, K).T          # [K, HW]
        val_k, idx_k = jax.lax.top_k(flat, bbox_k)  # [K, k]
        tag_flat = tags.reshape(H * W, K).T
        tag_k = jnp.take_along_axis(tag_flat, idx_k, axis=1)

        cxi = jnp.clip(jnp.trunc(cx + 0.5).astype(jnp.int32), 0, W - 1)
        cyi = jnp.clip(jnp.trunc(cy + 0.5).astype(jnp.int32), 0, H - 1)
        center_tag = tags[cyi, cxi, 0]

        # filler slots (top_k of a window smaller than bbox_k returns -inf
        # values at arbitrary indices) must not compete in the tag match —
        # their tags point at garbage cells outside the window
        dist = jnp.where(
            jnp.isfinite(val_k), jnp.abs(tag_k - center_tag), jnp.inf
        )
        pick = jnp.argmin(dist, axis=1)  # [K]
        sel = lambda a: jnp.take_along_axis(a, pick[:, None], axis=1)[:, 0]
        idx = sel(idx_k)
        conf = sel(val_k)
        tag = sel(tag_k)
        x = (idx % W).astype(jnp.float32)
        y = (idx // W).astype(jnp.float32)
        out = jnp.stack([x, y, jnp.where(jnp.isfinite(conf), conf, 0.0), tag],
                        axis=-1)
        return out * (box[4] > 0)

    return jax.vmap(
        lambda hm, tg, bs: jax.vmap(lambda b: per_box(hm, tg, b))(bs)
    )(heatmaps, tag_maps, boxes)


@jax.jit
def _adjust_quarter(keypoints, heatmaps):
    """+-0.25 shift toward the local gradient
    (reference: HeatmapParser.py:197-223).

    Args:
        keypoints: [B, M, K, 4]; heatmaps: [B, H, W, K].
    """
    B, H, W, K = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, K)
    x = jnp.trunc(keypoints[..., 0]).astype(jnp.int32)  # [B, M, K]
    y = jnp.trunc(keypoints[..., 1]).astype(jnp.int32)
    xc = jnp.clip(x, 0, W - 1)
    yc = jnp.clip(y, 0, H - 1)

    # gather per (B, M, K) at the matching joint channel
    def v(dx, dy):
        ii = jnp.clip((yc + dy), 0, H - 1) * W + jnp.clip((xc + dx), 0, W - 1)
        # flat: [B, HW, K]; ii: [B, M, K]
        g = jnp.take_along_axis(flat, ii.reshape(B, -1, K)[:, :, :], axis=1)
        return g.reshape(ii.shape)

    # strict-greater comparison with CLAMPED neighbors, applied at borders
    # too (reference HeatmapParser.py:212-220; no +0.5 in this lineage);
    # padded invalid rows (conf 0) stay untouched
    dx = jnp.where(v(1, 0) > v(-1, 0), 0.25, -0.25)
    dy = jnp.where(v(0, 1) > v(0, -1), 0.25, -0.25)
    valid = (keypoints[..., 2] > 0).astype(jnp.float32)
    out = keypoints.at[..., 0].add(dx * valid)
    out = out.at[..., 1].add(dy * valid)
    return out


class HeatmapParser:
    """Multi-hand bottom-up parser (reference: utils/HeatmapParser.py).

    Expects model outputs with channel layout [center, joints...] for
    heatmaps plus tag maps.
    """

    def __init__(self, cfg, num_candidates: int | None = None,
                 bbox_k: int | None = None,
                 max_num_bbox: int | None = None):
        self.image_size = tuple(int(v) for v in cfg.DATASET.image_size)
        self.heatmap_size = tuple(int(v) for v in cfg.DATASET.heatmap_size)
        self.feature_stride = self.image_size[0] / self.heatmap_size[0]
        self.num_candidates = int(
            num_candidates if num_candidates is not None
            else pcfg.num_candidates
        )
        self.bbox_k = int(bbox_k if bbox_k is not None else pcfg.bbox_k)
        self.max_num_bbox = int(
            max_num_bbox if max_num_bbox is not None else pcfg.max_num_bbox
        )
        self.bbox_factor = float(pcfg.bbox_factor)

    def parse(self, center_maps, size_maps, joint_heatmaps, tag_maps,
              adjust: bool = True):
        """Full bottom-up parse.

        Args:
            center_maps: [B, H, W, 1]; size_maps: [B, H, W, 2].
            joint_heatmaps: [B, H, W, K]; tag_maps: [B, H, W, K or 1].

        Returns:
            (boxes [B, max_num_bbox, 5] image pixels,
             keypoints [B, max_num_bbox, K, 4] heatmap coords)
        """
        center = heatmap_nms(jnp.asarray(center_maps), int(pcfg.nms_kernel))
        cands = candidate_bboxes(
            center, jnp.asarray(size_maps), self.num_candidates,
            self.feature_stride,
            wh_scale=jnp.asarray(self.image_size, jnp.float32),
            # HeatmapParser.py:52-86: raw argmax centers, ratios clipped
            refine="none", wh_clip=(0.0, 0.99),
        )
        boxes = masked_nms(
            cands, float(pcfg.iou_threshold), float(pcfg.detection_threshold),
            self.max_num_bbox,
        )
        peaks = heatmap_nms(jnp.asarray(joint_heatmaps), 3)
        kpts = _group_by_tags(
            peaks, jnp.asarray(tag_maps), boxes, self.bbox_factor,
            self.feature_stride, bbox_k=self.bbox_k,
        )
        if adjust:
            kpts = _adjust_quarter(kpts, jnp.asarray(joint_heatmaps))
        return np.asarray(boxes), np.asarray(kpts)


class HeatmapParserSH(HeatmapParser):
    """Single-hand variant (reference: utils/SPheatmapParser.py:12-240):
    no bbox detection; one group spanning the whole map."""

    def parse_single(self, joint_heatmaps, adjust: bool = True):
        B, H, W, K = joint_heatmaps.shape
        full = np.tile(
            np.array(
                [[self.image_size[0] / 2, self.image_size[1] / 2,
                  self.image_size[0], self.image_size[1], 1.0]], np.float32
            ),
            (B, 1),
        )[:, None, :]
        peaks = heatmap_nms(jnp.asarray(joint_heatmaps), 3)
        kpts = _group_by_tags(
            peaks, jnp.ones_like(peaks[..., :1]), jnp.asarray(full),
            1.0, self.feature_stride, bbox_k=1,
        )
        if adjust:
            kpts = _adjust_quarter(kpts, jnp.asarray(joint_heatmaps))
        return np.asarray(kpts)[:, 0]
