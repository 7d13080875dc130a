"""ResultParser: multi-hand center-map decoding with cycle detection.

Reference: utils/result_parser.py:14-399 — center map -> candidate bboxes ->
NMS -> per-bbox keypoint extraction inside a 1.3x window -> cycle detection
(small or overlapping hands are re-cropped and re-inferred at a reduced
size) -> multi-hand PCK by center matching.

TPU redesign: bbox decode and NMS are one jitted fixed-size program
(litehandnet_tpu.ops.detect); per-bbox keypoint windows use masked argmax
over the full map (no dynamic crops); cycle detection batches all flagged
crops through one fixed-size secondary jit.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from litehandnet_tpu.config import pcfg
from litehandnet_tpu.ops.decode import (
    argmax_coords,
    refine_dark,
    refine_offset_gen1,
)
from litehandnet_tpu.ops.detect import (
    bbox_iou,
    candidate_bboxes,
    heatmap_nms,
    masked_nms,
    vector_nms,
)


@functools.partial(jax.jit, static_argnames=("use_dark", "kernel"))
def _masked_keypoints(heatmaps, boxes, bbox_factor, feature_stride,
                      use_dark=True, kernel=19):
    """Keypoints per bbox window: mask the heatmap outside the (padded) box
    and decode (batched equivalent of reference _get_first_result,
    result_parser.py:296-320).

    Args:
        heatmaps: [B, H, W, K].
        boxes: [B, M, 5] (cx, cy, w, h, conf) in input-image pixels.

    Returns:
        [B, M, K, 3] keypoints in input-image pixels.
    """
    B, H, W, K = heatmaps.shape
    M = boxes.shape[1]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]

    def per_box(hm, box):
        cx, cy, w, h = box[0], box[1], box[2], box[3]
        w = w * bbox_factor / feature_stride
        h = h * bbox_factor / feature_stride
        cx = cx / feature_stride
        cy = cy / feature_stride
        x1, x2 = cx - w / 2, cx + w / 2
        y1, y2 = cy - h / 2, cy + h / 2
        mask = ((xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2))
        empty = ~jnp.any(mask)
        mask = jnp.where(empty, jnp.ones_like(mask), mask)
        masked = hm * mask[..., None]
        preds, maxvals = argmax_coords(masked[None])
        if use_dark:
            # reference get_pred_kpt -> adjust_keypoints_by_DARK with
            # pcfg['blue_kernel'] = 19 (heatmap_post_processing.py:35-54)
            preds = refine_dark(masked[None], preds, kernel=kernel)
        else:
            # reference adjust_keypoints_by_offset: clamped ±0.25 + 0.5
            preds = refine_offset_gen1(masked[None], preds)
        kpt = jnp.concatenate([preds[0] * feature_stride, maxvals[0]], axis=-1)
        return kpt * (box[4] > 0)

    return jax.vmap(
        lambda hm, bs: jax.vmap(lambda b: per_box(hm, b))(bs)
    )(heatmaps, boxes)


class ResultParser:
    """Decode multi-hand results from (heatmaps + region maps [+ SimDR]).

    Args:
        cfg: experiment config (DATASET.image_size, PIPELINE settings).
        model_fn: optional callable(img_crops [N, h, w, 3]) -> heatmaps,
            used for cycle-detection re-inference.
    """

    def __init__(self, cfg, model_fn: Optional[Callable] = None,
                 num_candidates: Optional[int] = None,
                 max_num_bbox: Optional[int] = None,
                 cd_iou: Optional[float] = None,
                 cd_ratio: Optional[float] = None,
                 cd_enabled: bool = True, cd_reduction: int = 2):
        self.image_size = tuple(int(v) for v in cfg.DATASET.image_size)
        hm = cfg.DATASET.heatmap_size
        if hm and isinstance(hm[0], (list, tuple)):
            hm = hm[-1]  # multi-scale (SRHandNet): parse at the finest scale
        self.heatmap_size = tuple(int(v) for v in hm)
        self.feature_stride = self.image_size[0] / self.heatmap_size[0]
        self.num_candidates = int(
            num_candidates if num_candidates is not None
            else pcfg.num_candidates
        )
        self.max_num_bbox = int(
            max_num_bbox if max_num_bbox is not None else pcfg.max_num_bbox
        )
        self.cd_iou = float(
            cd_iou if cd_iou is not None else pcfg.cycle_detection_diou
        )
        self.cd_ratio = float(
            cd_ratio if cd_ratio is not None
            else pcfg.cycle_detection_area_ratio
        )
        self.detection_threshold = float(pcfg.detection_threshold)
        self.iou_threshold = float(pcfg.iou_threshold)
        self.bbox_factor = float(pcfg.bbox_factor)
        self.use_dark = bool(cfg.get("PIPELINE", {}).get("unbiased_encoding", True))
        self.simdr_split_ratio = int(
            cfg.get("PIPELINE", {}).get("simdr_split_ratio", 0) or 0
        )
        self.model_fn = model_fn
        self.cd_enabled = cd_enabled and model_fn is not None
        self.cd_reduction = cd_reduction
        self.image_area = self.image_size[0] * self.image_size[1]

        @jax.jit
        def _pred_bbox(region_maps):
            center = heatmap_nms(region_maps[..., :1], int(pcfg.nms_kernel))
            cands = candidate_bboxes(
                center, region_maps[..., 1:3], self.num_candidates,
                self.feature_stride, wh_scale=jnp.asarray(
                    self.image_size, jnp.float32
                ),
                # centers refine like keypoints do (result_parser.py:158-163)
                refine="dark" if self.use_dark else "offset",
                kernel=int(pcfg.dark_kernel),
            )
            return masked_nms(
                cands, self.iou_threshold, self.detection_threshold,
                self.max_num_bbox,
            )

        self._pred_bbox = _pred_bbox

    # -- bbox decoding ----------------------------------------------------
    def get_pred_bbox(self, region_maps) -> np.ndarray:
        """Region maps [B, H, W, 3] -> padded boxes [B, max_num_bbox, 5]."""
        return np.asarray(self._pred_bbox(jnp.asarray(region_maps)))

    # -- keypoints --------------------------------------------------------
    def get_group_keypoints(self, images, heatmaps, boxes) -> np.ndarray:
        """Per-bbox keypoints with cycle detection
        (reference: result_parser.py:251-348).

        Args:
            images: [B, H_img, W_img, 3] normalized inputs (for re-crops).
            heatmaps: [B, H, W, K] keypoint heatmaps.
            boxes: [B, M, 5] from get_pred_bbox.

        Returns:
            [B, M, K, 3] keypoints in input-image pixels.
        """
        kpts = np.array(
            _masked_keypoints(
                jnp.asarray(heatmaps), jnp.asarray(boxes),
                self.bbox_factor, self.feature_stride,
                use_dark=self.use_dark,
            )
        )
        if not self.cd_enabled:
            return kpts

        boxes = np.asarray(boxes)
        B, M = boxes.shape[:2]
        flagged = []
        for b in range(B):
            valid = boxes[b][boxes[b][:, 4] > 0]
            for m in range(M):
                box = boxes[b, m]
                if box[4] <= 0:
                    continue
                if self._is_cycle_detection(box, valid):
                    flagged.append((b, m))
        if flagged:
            crops, metas = [], []
            W_img, H_img = self.image_size
            size = (
                H_img // self.cd_reduction, W_img // self.cd_reduction
            )
            images = np.asarray(images)
            for b, m in flagged:
                cx, cy, w, h = boxes[b, m, :4]
                w2, h2 = w * self.bbox_factor, h * self.bbox_factor
                x1 = max(0, int(cx - w2 / 2 + 0.5))
                y1 = max(0, int(cy - h2 / 2 + 0.5))
                x2 = min(W_img, int(cx + w2 / 2 + 0.5))
                y2 = min(H_img, int(cy + h2 / 2 + 0.5))
                if x2 <= x1 or y2 <= y1:
                    continue
                crop = images[b, y1:y2, x1:x2]
                crop = _resize_nearest_np(crop, size)
                crops.append(crop)
                metas.append((b, m, x1, y1, x2 - x1, y2 - y1))
            if crops:
                crops = np.stack(crops)
                hm = np.asarray(self.model_fn(crops))
                kpt2 = np.asarray(
                    _masked_keypoints(
                        jnp.asarray(hm),
                        jnp.asarray(
                            np.tile(
                                np.array([[0, 0, 1e6, 1e6, 1.0]], np.float32),
                                (len(metas), 1),
                            )[:, None, :]
                        ),
                        self.bbox_factor, self.feature_stride,
                        use_dark=self.use_dark,
                    )
                )[:, 0]  # [N, K, 3]
                for i, (b, m, x1, y1, w, h) in enumerate(metas):
                    k = kpt2[i].copy()
                    k[:, 0] = k[:, 0] * (w / size[1]) + x1
                    k[:, 1] = k[:, 1] * (h / size[0]) + y1
                    kpts[b, m] = k
        return kpts

    def _is_cycle_detection(self, box, boxes, iou_thr=None, ratio=None):
        """Reference: result_parser.py:276-294."""
        iou_thr = iou_thr if iou_thr is not None else self.cd_iou
        ratio = ratio if ratio is not None else self.cd_ratio
        area = box[2] * box[3]
        if area != 0 and area / self.image_area <= ratio:
            return True
        ious = np.asarray(
            bbox_iou(jnp.asarray(box[:4]), jnp.asarray(boxes[:, :4]), diou=True)
        )
        return (ious > iou_thr).sum() > 1

    # -- SimDR ------------------------------------------------------------
    def get_kpts_from_vectors(self, x_vectors, y_vectors, boxes) -> np.ndarray:
        """SimDR vector decode inside bbox windows
        (reference: result_parser.py:93-129).

        Args:
            x_vectors: [B, K, W*k]; y_vectors: [B, K, H*k].
            boxes: [B, M, 5] image-space boxes.

        Returns:
            [B, M, K, 3].
        """
        k = max(self.simdr_split_ratio, 1)
        xv = np.asarray(vector_nms(jnp.asarray(x_vectors)))
        yv = np.asarray(vector_nms(jnp.asarray(y_vectors)))
        B, K, Wv = xv.shape
        Hv = yv.shape[-1]
        boxes = np.asarray(boxes)
        M = boxes.shape[1]
        out = np.zeros((B, M, K, 3), np.float32)
        xs = np.arange(Wv)
        ys = np.arange(Hv)
        for b in range(B):
            for m in range(M):
                box = boxes[b, m] * k
                if boxes[b, m, 4] <= 0:
                    continue
                x1 = max(int(box[0] - box[2] / 2), 0)
                x2 = min(int(box[0] + box[2] / 2), Wv)
                y1 = max(int(box[1] - box[3] / 2), 0)
                y2 = min(int(box[1] + box[3] / 2), Hv)
                mx = (xs >= x1) & (xs < x2)
                my = (ys >= y1) & (ys < y2)
                sxv = xv[b] * mx
                syv = yv[b] * my
                xi = sxv.argmax(axis=1)
                yi = syv.argmax(axis=1)
                score = (
                    sxv[np.arange(K), xi] + syv[np.arange(K), yi]
                ) / 2.0
                out[b, m, :, 0] = xi / k
                out[b, m, :, 1] = yi / k
                out[b, m, :, 2] = score
        return out

    # -- metrics ----------------------------------------------------------
    @staticmethod
    def evaluate_ap(pred_bboxes, gt_bboxes, iou_thr=None):
        from litehandnet_tpu.eval.ap import count_ap

        return count_ap(pred_bboxes, gt_bboxes, iou_thr)

    def evaluate_pck(self, pred_kpts, gt_kpts, gt_bboxes, thr=0.2):
        """Multi-hand PCK by center matching
        (reference: result_parser.py:356-399).

        Args:
            pred_kpts: [B, M, K, 3] (x, y, score).
            gt_kpts: [B, M, K, 3] (x, y, vis).
            gt_bboxes: [B, N, 4] (cx, cy, w, h).
        """
        pred_kpts = np.asarray(pred_kpts)
        gt_kpts = np.asarray(gt_kpts)
        gt_bboxes = np.asarray(gt_bboxes)
        pcks = []
        for pk, gk, boxes in zip(pred_kpts, gt_kpts, gt_bboxes):
            live = (pk[:, :, 2] > 0).sum(axis=1) > 0
            for pred in pk[live]:
                vis_mask = pred[:, 2] > 0
                if vis_mask.sum() == 0:
                    continue
                # reference quirk kept: the center sums ALL joint coords but
                # divides by the VISIBLE count (result_parser.py:372 —
                # kpts[:,:,:2].sum(dim=1) / num_vis_joints)
                center = pred[:, :2].sum(axis=0) / vis_mask.sum()
                d2 = ((boxes[:, :2] - center) ** 2).sum(axis=1)
                j = int(np.argmin(d2))
                gt = gk[j]
                gt_vis = gt[:, 2] > 0
                if gt_vis.sum() == 0:
                    continue
                norm = np.max(boxes[j, :2])
                dist = np.linalg.norm(
                    gt[gt_vis, :2] - pred[gt_vis, :2], axis=1
                )
                pcks.append(float((dist / norm < thr).mean()))
        return float(np.mean(pcks)) if pcks else 0.0


def _resize_nearest_np(img: np.ndarray, size) -> np.ndarray:
    h, w = size
    H, W = img.shape[:2]
    yi = (np.arange(h) * H // h).clip(0, H - 1)
    xi = (np.arange(w) * W // w).clip(0, W - 1)
    return img[yi][:, xi]
