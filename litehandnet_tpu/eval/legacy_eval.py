"""Gen-1 evaluation helpers (reference: utils/evaluation.py).

These are the older center-map-era metrics used by the Gen-1 trainers
(train_distributed_center_simdr_*.py) and the prediction-dump drivers
(test/test_pred_outputs*.py):

* ``heatmap_pck``        <- ``evaluate_pck``        (evaluation.py:10-59)
* ``cs_from_region_map`` <- same name               (evaluation.py:94-163)
* ``non_max_suppression``<- same name               (evaluation.py:166-211)
* ``evaluate_ap``        <- same name               (evaluation.py:214-238)

``count_ap`` lives in :mod:`litehandnet_tpu.eval.ap`. Note this lineage's
wh-extraction differs from :mod:`..eval.result_parser`'s (windowed mean of
the raw maps scaled by the feature stride, vs avg-pool at the argmax cell
scaled by the image size) — both conventions exist in the reference and
both are kept.

TPU redesign: the candidate extraction is one jitted fixed-shape program
(per-candidate window means via broadcast masks instead of python slicing);
the NMS/AP bookkeeping stays host-side numpy like the reference's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from litehandnet_tpu.config import pcfg
from litehandnet_tpu.eval.ap import count_ap


def heatmap_pck(pred_heatmaps, gt_heatmaps, bbox, image_size=256,
                target_weight=None, thr=0.2) -> float:
    """Heatmap-space PCK (reference ``evaluate_pck``, evaluation.py:10-59).

    Argmax coordinates of both maps are scaled to image space and compared
    against ``thr * max(w, h)`` of each sample's FIRST bbox. Kept quirks:
    coordinates zero out where the max value is <= 0, and the per-sample
    score divides by the duplicated weight sum then multiplies by 2.

    Args:
        pred_heatmaps / gt_heatmaps: [B, H, W, K] (channels-last).
        bbox: [B, M, 4] (cx, cy, w, h); only hand 0 is used.
        image_size: scalar or (w, h) of the model input.
        target_weight: optional [B, K, 1] visibility weights.
        thr: PCK threshold fraction.
    """
    pred_heatmaps = np.asarray(pred_heatmaps)
    gt_heatmaps = np.asarray(gt_heatmaps)
    bbox = np.asarray(bbox, np.float32)[:, 0]
    B, H, W, K = pred_heatmaps.shape

    def coords(hm):
        flat = hm.reshape(B, H * W, K)
        idx = flat.argmax(axis=1)                       # [B, K]
        val = flat.max(axis=1)
        c = np.stack([(idx % W), (idx // W)], axis=-1).astype(np.float32)
        return c * (val > 0)[..., None]

    pred = coords(pred_heatmaps)
    target = coords(gt_heatmaps)
    factor = np.broadcast_to(
        np.asarray(image_size, np.float32), (2,)
    ) / np.array([W, H], np.float32)
    pred = pred * factor
    target = target * factor

    max_wh = bbox[:, 2:4].max(axis=-1)                   # [B]
    if target_weight is None:
        tw = np.ones((B, K, 2), np.float32)
    else:
        tw = np.repeat(np.asarray(target_weight, np.float32), 2, axis=-1)

    pcks = []
    for i in range(B):
        vis = tw[i, :, 0] == 1
        dist = np.linalg.norm(pred[i][vis] - target[i][vis], axis=-1)
        dist = dist / max_wh[i]
        pcks.append(float((dist < thr).sum() / tw[i].sum() * 2))
    return float(np.mean(pcks))


@functools.partial(jax.jit, static_argnames=("k", "heatmap_sigma"))
def cs_from_region_map(region_maps, image_size=256.0, k=20, thr=0.8,
                       heatmap_sigma=2):
    """Top-k candidate bboxes from raw region maps
    (reference evaluation.py:94-163 — note: NO peak NMS before top-k, and
    wh is the mean of a +-3*sigma window scaled by the feature stride).

    Args:
        region_maps: [B, H, W, 3] (center, w, h), channels-last.

    Returns:
        [B, k, 5] (cx, cy, w, h, conf) — cx/cy/w/h zero where conf <= thr;
        coordinates in input-image pixels.
    """
    B, H, W, _ = region_maps.shape
    center = region_maps[..., 0].reshape(B, H * W)
    top_val, top_idx = jax.lax.top_k(center, k)          # [B, k]
    cx = (top_idx % W).astype(jnp.int32)
    cy = (top_idx // W).astype(jnp.int32)

    # window [c - 3*sigma, c + 3*sigma + 1) with the reference's clip quirk:
    # BOTH ends clip to size-1, so the last row/column never participates
    t = int(heatmap_sigma) * 3
    x1 = jnp.clip(cx - t, 0, W - 1)
    x2 = jnp.clip(cx + t + 1, 0, W - 1)
    y1 = jnp.clip(cy - t, 0, H - 1)
    y2 = jnp.clip(cy + t + 1, 0, H - 1)
    xs = jnp.arange(W)[None, None, :]
    ys = jnp.arange(H)[None, None, :]
    mx = (xs >= x1[..., None]) & (xs < x2[..., None])    # [B, k, W]
    my = (ys >= y1[..., None]) & (ys < y2[..., None])    # [B, k, H]
    win = (my[..., :, None] & mx[..., None, :]).astype(jnp.float32)
    cnt = jnp.maximum(win.sum((-1, -2)), 1.0)
    gx = (region_maps[..., 1][:, None] * win).sum((-1, -2)) / cnt
    gy = (region_maps[..., 2][:, None] * win).sum((-1, -2)) / cnt

    # the reference derives the stride from shape[-1] (assumes square maps)
    stride = jnp.asarray(image_size, jnp.float32) / W
    flag = (top_val > thr).astype(jnp.float32)
    return jnp.stack([
        cx.astype(jnp.float32) * stride * flag,
        cy.astype(jnp.float32) * stride * flag,
        gx * stride * flag,
        gy * stride * flag,
        top_val,
    ], axis=-1)


def _xywh2xyxy(x):
    y = np.zeros_like(x)
    y[:, 0] = x[:, 0] - x[:, 2] / 2
    y[:, 1] = x[:, 1] - x[:, 3] / 2
    y[:, 2] = x[:, 0] + x[:, 2] / 2
    y[:, 3] = x[:, 1] + x[:, 3] / 2
    return y


def non_max_suppression(prediction, iou_threshold=0.8, conf_threshold=0.8,
                        max_num=100):
    """Greedy NMS over candidate rows (reference evaluation.py:166-211:
    strict conf/size gates, torchvision-nms semantics — suppress IoU
    STRICTLY greater than the threshold against a higher-scoring kept box).

    Args:
        prediction: [B, k, 5] (cx, cy, w, h, conf).

    Returns:
        list of per-image python lists (or None when nothing survives).
    """
    prediction = np.asarray(prediction, np.float32)
    min_wh, max_wh = 2, 4096
    output = [None] * prediction.shape[0]
    for i, x in enumerate(prediction):
        x = x[x[:, 4] > conf_threshold]
        x = x[((x[:, 2:4] > min_wh) & (x[:, 2:4] < max_wh)).all(1)]
        if not x.shape[0]:
            continue
        boxes = _xywh2xyxy(x[:, :4])
        order = np.argsort(-x[:, 4], kind="stable")
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        keep, suppressed = [], np.zeros(len(order), bool)
        for oi in order:
            if suppressed[oi]:
                continue
            keep.append(oi)
            ix1 = np.maximum(boxes[oi, 0], boxes[:, 0])
            iy1 = np.maximum(boxes[oi, 1], boxes[:, 1])
            ix2 = np.minimum(boxes[oi, 2], boxes[:, 2])
            iy2 = np.minimum(boxes[oi, 3], boxes[:, 3])
            inter = (np.clip(ix2 - ix1, 0, None)
                     * np.clip(iy2 - iy1, 0, None))
            iou = inter / np.maximum(areas[oi] + areas - inter, 1e-12)
            suppressed |= iou > iou_threshold
        output[i] = x[keep[:max_num]].tolist()
    return output


def evaluate_ap(region_maps, gt_boxes, image_size=256, k=20, iou_thr=None):
    """Region maps -> NMS'ed boxes -> AP (reference evaluation.py:214-238;
    thresholds and the kept-box cap come from pcfg exactly as upstream).

    Args:
        region_maps: [B, H, W, 3] channels-last.
        gt_boxes: per-image list of (cx, cy, w, h) rows.

    Returns:
        (AP50, mean AP, pred_bboxes list)
    """
    candidates = np.asarray(cs_from_region_map(
        jnp.asarray(region_maps), float(image_size), k,
        float(pcfg.detection_threshold),
    ))
    pred_bboxes = non_max_suppression(
        candidates, float(pcfg.iou_threshold),
        float(pcfg.detection_threshold), int(pcfg.max_num_bbox),
    )
    gt_boxes = (
        gt_boxes.tolist() if isinstance(gt_boxes, np.ndarray) else gt_boxes
    )
    ap50, ap = count_ap(pred_bboxes, gt_boxes, iou_thr)
    return float(ap50), float(ap), pred_bboxes
