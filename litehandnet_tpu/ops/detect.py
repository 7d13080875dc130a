"""Center-map bbox detection ops: peak NMS, top-k candidates, IoU math, and
fixed-size masked NMS — all static-shape, jit-friendly.

Reference behavior: utils/evaluation.py:94-211 and utils/result_parser.py
:131-229, redesigned for TPU: the reference returns ragged per-image python
lists; here every stage emits fixed-size padded tensors with validity encoded
in the confidence column (SURVEY.md §7 "dynamic shapes" hard part).
Layout: center/size maps are channels-last [B, H, W, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def heatmap_nms(heatmaps: jnp.ndarray, kernel: int = 11) -> jnp.ndarray:
    """Max-pool peak NMS: non-peak pixels are zeroed
    (reference: result_parser.py heatmap_nms / HeatmapParser.py:41-50).

    Args:
        heatmaps: [B, H, W, C].
    """
    pad = (kernel - 1) // 2
    maxima = jax.lax.reduce_window(
        heatmaps, -jnp.inf, jax.lax.max,
        (1, kernel, kernel, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return jnp.where(maxima == heatmaps, heatmaps, 0.0)


def vector_nms(vectors: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """1-D peak NMS over the last axis (reference: result_parser.py:61-74)."""
    pad = (kernel - 1) // 2
    maxima = jax.lax.reduce_window(
        vectors, -jnp.inf, jax.lax.max,
        (1, 1, kernel), (1, 1, 1), [(0, 0), (0, 0), (pad, pad)],
    )
    return jnp.where(maxima == vectors, vectors, 0.0)


def smooth_avg_pool(x: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Size-preserving average pooling ([B, H, W, C]).

    Divides by kernel^2 everywhere — torch's AvgPool2d default
    count_include_pad=True, which the reference relies on
    (result_parser.py:20-23): border cells average zeros in, so decoded
    box sizes shrink toward the map edge rather than inflating."""
    pad = (kernel - 1) // 2
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kernel, kernel, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return s / float(kernel * kernel)


def candidate_bboxes(
    center_maps: jnp.ndarray,
    size_maps: jnp.ndarray,
    num_candidates: int = 20,
    feature_stride: float = 4.0,
    wh_scale=None,
    refine: str = "offset",
    kernel: int = 19,
    wh_clip=None,
) -> jnp.ndarray:
    """Top-k candidate boxes from center + size maps
    (reference: result_parser.py:131-172, HeatmapParser.py:52-86).

    The w/h lookup happens at the RAW integer argmax cell, BEFORE center
    refinement — matching the reference's ordering (it reads size_maps at
    the int top-k coordinate, then refines the center).

    Args:
        center_maps: [B, H, W, 1] peak-NMS'ed center heatmap.
        size_maps: [B, H, W, 2] width/height maps. Units depend on the
            encoder: Gen-2 SRHandNet region maps store *ratios* of the input
            size (generateTarget.py:351-353) -> pass
            wh_scale=(img_w, img_h); Gen-1 center-SimDR targets store
            heatmap pixels -> wh_scale=feature_stride (the default).
        refine: 'dark' (blur+log+Taylor, adjust_keypoints_by_DARK) |
            'offset' (clamped ±0.25 + 0.5, adjust_keypoints_by_offset) |
            'none' (HeatmapParser takes the raw argmax).
        kernel: DARK blur kernel (reference pcfg['blue_kernel'] = 19).
        wh_clip: optional (lo, hi) ratio clip (HeatmapParser.py clips
            0..0.99; the ResultParser lineage does not).

    Returns:
        [B, k, 5] (cx, cy, w, h, conf) in input-image pixels.
    """
    from litehandnet_tpu.ops.decode import refine_dark, refine_offset_gen1

    B, H, W, _ = center_maps.shape
    flat = center_maps[..., 0].reshape(B, H * W)
    top_val, top_idx = jax.lax.top_k(flat, num_candidates)  # [B, k]
    x = (top_idx % W).astype(jnp.float32)
    y = (top_idx // W).astype(jnp.float32)

    # w/h read at the raw argmax cell (before refinement)
    smoothed = smooth_avg_pool(size_maps, 3)  # [B, H, W, 2]
    flat_wh = smoothed.reshape(B, H * W, 2)
    wh = jnp.take_along_axis(flat_wh, top_idx[..., None], axis=1)  # [B,k,2]
    if wh_clip is not None:
        wh = jnp.clip(wh, wh_clip[0], wh_clip[1])

    if refine != "none":
        # refine the centers exactly as the Gen-1 keypoint path does
        # (reference result_parser.py:158-163 feeds each candidate through
        # adjust_keypoints_by_DARK / adjust_keypoints_by_offset)
        preds = jnp.stack([x, y], axis=-1)  # [B, k, 2]
        cm = jnp.broadcast_to(
            center_maps, (B, H, W, num_candidates)
        )  # per-candidate channel view of the same map
        if refine == "dark":
            preds = refine_dark(cm, preds, kernel=kernel)
        else:
            preds = refine_offset_gen1(cm, preds)
        x, y = preds[..., 0], preds[..., 1]

    if wh_scale is None:
        wh_scale = (feature_stride, feature_stride)
    elif jnp.ndim(wh_scale) == 0:
        wh_scale = (wh_scale, wh_scale)
    cx = x * feature_stride
    cy = y * feature_stride
    w = wh[..., 0] * wh_scale[0]
    h = wh[..., 1] * wh_scale[1]
    return jnp.stack([cx, cy, w, h, top_val], axis=-1)


def xywh2xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2) (reference: bbox_metric.py)."""
    cx, cy, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def bbox_iou(
    box1: jnp.ndarray,
    boxes2: jnp.ndarray,
    xyxy: bool = False,
    giou: bool = False,
    diou: bool = False,
    ciou: bool = False,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """IoU of one box vs N boxes with GIoU/DIoU/CIoU variants
    (reference: utils/bbox_metric.py:76-133)."""
    if not xyxy:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(boxes2)
    else:
        b1, b2 = box1, boxes2
    inter_x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    inter_y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    inter_x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    inter_y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(inter_x2 - inter_x1, 0) * jnp.clip(inter_y2 - inter_y1, 0)
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = area1 + area2 - inter + eps
    iou = inter / union
    if not (giou or diou or ciou):
        return iou

    cw = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    ch = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    if giou:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    c2 = cw**2 + ch**2 + eps
    rho2 = (
        ((b2[..., 0] + b2[..., 2]) - (b1[..., 0] + b1[..., 2])) ** 2
        + ((b2[..., 1] + b2[..., 3]) - (b1[..., 1] + b1[..., 3])) ** 2
    ) / 4.0
    if diou:
        return iou - rho2 / c2
    # CIoU
    w1 = b1[..., 2] - b1[..., 0]
    h1 = b1[..., 3] - b1[..., 1]
    w2 = b2[..., 2] - b2[..., 0]
    h2 = b2[..., 3] - b2[..., 1]
    v = (4 / jnp.pi**2) * (
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    ) ** 2
    alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def masked_nms(
    candidates: jnp.ndarray,
    iou_threshold: float = 0.6,
    conf_threshold: float = 0.1,
    max_out: int = 10,
    min_wh: float = 2.0,
    max_wh: float = 4096.0,
) -> jnp.ndarray:
    """Fixed-size greedy IoU NMS (reference: result_parser.py:174-214,
    evaluation.py:166-211 — which return ragged lists; here the output is a
    padded [B, max_out, 5] with suppressed/empty slots at confidence 0).

    Args:
        candidates: [B, k, 5] (cx, cy, w, h, conf), any order.
    """
    conf = candidates[..., 4]
    size_ok = (
        (candidates[..., 2] > min_wh) & (candidates[..., 2] < max_wh)
        & (candidates[..., 3] > min_wh) & (candidates[..., 3] < max_wh)
    )
    valid = (conf > conf_threshold) & size_ok
    conf = jnp.where(valid, conf, 0.0)
    k = candidates.shape[1]

    def per_image(boxes, conf):
        order = jnp.argsort(-conf)
        boxes = boxes[order]
        conf = conf[order]

        def body(i, alive):
            keep_i = alive[i] & (conf[i] > 0)
            ious = bbox_iou(boxes[i, :4], boxes[:, :4])
            suppress = (ious > iou_threshold) & keep_i
            idx = jnp.arange(k)
            return jnp.where(suppress & (idx > i), False, alive)

        alive = jax.lax.fori_loop(0, k, body, conf > 0)
        final_conf = jnp.where(alive, conf, 0.0)
        out_order = jnp.argsort(-final_conf)[:max_out]
        out = boxes[out_order]
        return out.at[:, 4].set(final_conf[out_order])

    return jax.vmap(per_image)(candidates, conf)


def xyxy2xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h) (reference: bbox_metric.py)."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, width: float, height: float) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds (reference: bbox_transform.py)."""
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, width),
            jnp.clip(boxes[..., 1], 0, height),
            jnp.clip(boxes[..., 2], 0, width),
            jnp.clip(boxes[..., 3], 0, height),
        ],
        axis=-1,
    )


def rescale_boxes(boxes: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Scale box coordinates (reference: bbox_transform.py rescale)."""
    return boxes * scale


def flip_boxes(boxes: jnp.ndarray, width: float) -> jnp.ndarray:
    """Horizontal flip of xyxy boxes (reference: bbox_transform.py)."""
    return jnp.stack(
        [
            width - boxes[..., 2], boxes[..., 1],
            width - boxes[..., 0], boxes[..., 3],
        ],
        axis=-1,
    )
