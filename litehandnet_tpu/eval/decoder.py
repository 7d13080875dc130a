"""TopDownDecoder: batch decode of model outputs into result dicts.

Reference surface: utils/post_processing/decoder.py:9-107 — decode heatmaps
(or SimDR vectors) plus batch metadata into the result dict consumed by
``dataset.evaluate``. The numeric work (argmax, DARK/UDP refinement, unwarp)
runs jitted on device via litehandnet_tpu.ops.decode; only the final dict
assembly is host-side.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from litehandnet_tpu.config import pcfg
from litehandnet_tpu.ops.decode import (
    keypoints_from_heatmaps,
    keypoints_from_simdr,
)


class TopDownDecoder:
    def __init__(self, cfg):
        self.cfg = cfg
        pipeline = cfg.get("PIPELINE", {})
        self.use_udp = bool(pipeline.get("use_udp", False))
        self.unbiased = bool(pipeline.get("unbiased_encoding", False))
        kernel = pipeline.get("kernel", (11, 11))
        self.kernel = kernel[0] if isinstance(kernel, (list, tuple)) else kernel
        self.post_process = "unbiased" if self.unbiased else "default"
        self.simdr_split_ratio = pipeline.get("simdr_split_ratio", 0)

        @functools.partial(jax.jit, static_argnames=("post_process", "use_udp", "kernel"))
        def _decode(hm, center, scale, post_process, use_udp, kernel):
            return keypoints_from_heatmaps(
                hm, center, scale, post_process=post_process,
                kernel=kernel, use_udp=use_udp,
            )

        self._decode = _decode

    def decode(self, meta, outputs):
        """Decode heatmap outputs.

        Args:
            meta: dict with 'center' [N, 2], 'scale' [N, 2], and optionally
                'image_file', 'bbox_id', 'bbox_score'.
            outputs: [N, H, W, K] heatmaps (channels-last).

        Returns:
            dict(preds [N, K, 3], hm_preds [N, K, 2], boxes [N, 6],
                 image_paths, bbox_ids, output_heatmap)
        """
        center = np.asarray(meta["center"], np.float32)
        scale = np.asarray(meta["scale"], np.float32)
        hm_preds, preds, maxvals = self._decode(
            outputs, center, scale,
            post_process=self.post_process,
            use_udp=self.use_udp,
            kernel=int(self.kernel),
        )
        hm_preds = np.asarray(hm_preds)
        preds = np.concatenate([np.asarray(preds), np.asarray(maxvals)], axis=-1)

        N = preds.shape[0]
        boxes = np.zeros((N, 6), np.float32)
        boxes[:, 0:2] = center
        boxes[:, 2:4] = scale
        boxes[:, 4] = np.prod(scale * 200.0, axis=1)
        boxes[:, 5] = np.asarray(meta.get("bbox_score", np.ones(N)))
        return {
            "preds": preds,
            "hm_preds": hm_preds,
            "boxes": boxes,
            "image_paths": list(meta.get("image_file", [""] * N)),
            "bbox_ids": list(np.asarray(meta.get("bbox_id", np.arange(N)))),
            "output_heatmap": np.asarray(outputs),
        }

    def decode_simdr(self, meta, pred_x, pred_y):
        """Decode SimDR 1-D vectors (reference decoder.py:73-107)."""
        center = np.asarray(meta["center"], np.float32)
        scale = np.asarray(meta["scale"], np.float32)
        k = int(self.simdr_split_ratio)
        preds = np.asarray(
            keypoints_from_simdr(pred_x, pred_y, center, scale, split_ratio=k)
        )
        N = preds.shape[0]
        boxes = np.zeros((N, 6), np.float32)
        boxes[:, 0:2] = center
        boxes[:, 2:4] = scale
        boxes[:, 4] = np.prod(scale * 200.0, axis=1)
        boxes[:, 5] = np.asarray(meta.get("bbox_score", np.ones(N)))
        return {
            "preds": preds,
            "boxes": boxes,
            "image_paths": list(meta.get("image_file", [""] * N)),
            "bbox_ids": list(np.asarray(meta.get("bbox_id", np.arange(N)))),
        }
