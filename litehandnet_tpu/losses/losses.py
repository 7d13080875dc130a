"""Losses, fully vectorized (no per-joint python loops).

Reimplements the reference loss zoo (loss/heatmapLoss.py, loss/loss.py,
loss/centernet_simdr_loss.py) over NHWC tensors: heatmap outputs are
[B, H, W, K], targets [B, H, W, K], target weights [B, K].

Loss modules with trainable state (SimDR linear decoders, auto-weight MTL
parameters) are Flax modules; everything else is pure functions wrapped for a
uniform `(outputs, batch) -> (loss, loss_dict)` interface.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _l2(x, y):
    return (x - y) ** 2


def _l1(x, y):
    return jnp.abs(x - y)


def _smooth_l1(x, y):
    """torch.nn.SmoothL1Loss (beta=1)."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


_CRITERIA = {"l2": _l2, "mse": _l2, "l1": _l1, "mae": _l1, "smoothl1": _smooth_l1}


def distance_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: jnp.ndarray,
    loss_type: str = "L2",
    balance: bool = True,
    value: float = 0.5,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Weighted distance loss with pos/neg balancing
    (reference: heatmapLoss.py:228-265).

    Positive pixels (target > value) are scaled by numel/(n_pos+1)*0.1 and
    negatives by numel/(n_neg+1) — computed over the local shard, matching
    per-device DDP semantics.

    Args:
        output/target: [B, H, W, K] heatmaps or [B, K, D] coordinates.
        target_weight: [B, K].
    """
    crit = _CRITERIA[loss_type.lower()]
    if output.ndim == 5 and target.ndim == 4:
        # stacked model + single-sigma target: expand EXPLICITLY over the
        # stack dim (the implicit right-aligned broadcast would pair the
        # target's batch dim with the output's stack dim — an error for
        # B != S and silently wrong when B == S)
        target = target[:, None]
    loss = crit(output, target)
    if loss.ndim == 5:
        # stacked hourglass [B, S, H, W, K]: the target broadcasts over the
        # stack dim = intermediate supervision on every stack (the reference
        # relies on the same implicit broadcast, topdown_trainer.py:68-87)
        w = target_weight[:, None, None, None, :]
    elif loss.ndim == 4:  # [B, H, W, K] — weight broadcasts over H, W
        w = target_weight[:, None, None, :]
    else:  # [B, K, D]
        w = target_weight[..., None]
    loss = loss * w

    if balance:
        # broadcast the target to the FULL loss shape before counting:
        # with a stacked output and a single-sigma target, counting
        # positives on the unexpanded target would tally them once while
        # numel includes the stack dim, inflating pos_factor ~S x relative
        # to the equivalent list-sigma (stacked-target) config
        pos = jnp.broadcast_to(target, loss.shape) > value
        numel = float(loss.size)
        n_pos = jnp.sum(pos)
        pos_factor = numel / (n_pos + 1.0) * 0.1
        neg_factor = numel / (loss.size - n_pos + 1.0)
        loss = jnp.where(pos, loss * pos_factor, loss * neg_factor)

    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def joints_distance_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: Optional[jnp.ndarray] = None,
    loss_type: str = "mse",
) -> jnp.ndarray:
    """HRNet-style per-joint 0.5x loss (reference: heatmapLoss.py:175-225).

    Per joint: 0.5 * mean(crit(pred*w, gt*w)); averaged over joints.
    """
    crit = _CRITERIA[loss_type.lower()]
    B, H, W, K = output.shape
    pred = output.reshape(B, H * W, K)
    gt = target.reshape(B, H * W, K)
    if target_weight is not None:
        w = target_weight[:, None, :]
        pred = pred * w
        gt = gt * w
    per_joint = 0.5 * jnp.mean(crit(pred, gt), axis=(0, 1))  # [K]
    return jnp.mean(per_joint)


def kl_focal_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """KL divergence over per-channel softmaxed heatmaps
    (reference: heatmapLoss.py:5-44)."""
    B, H, W, K = output.shape
    pred = output.reshape(B, H * W, K)
    gt = target.reshape(B, H * W, K)
    log_p = jax.nn.log_softmax(pred, axis=1)
    q = jax.nn.softmax(gt, axis=1)
    # KLDiv(log_p, q) elementwise = q * (log q - log_p); summed over pixels
    log_q = jax.nn.log_softmax(gt, axis=1)
    kl = jnp.sum(q * (log_q - log_p), axis=1)  # [B, K]
    if target_weight is not None:
        kl = kl * target_weight
    return jnp.mean(kl)


def focal_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: Optional[jnp.ndarray] = None,
    alpha: float = 2.0,
    ratio: float = 0.25,
    thr: float = 0.4,
) -> jnp.ndarray:
    """CornerNet-derived focal loss (reference: heatmapLoss.py:48-108),
    vectorized over the (B, K) loops.
    """
    pos = target > thr
    distance = (target - output) ** alpha
    pos_pred = jnp.clip(output, 1e-30, 1.0)
    neg_pred = jnp.clip(1.0 - output, 1e-30, 1.0)

    pos_term = ratio * jnp.log(pos_pred) * distance
    neg_term = (1.0 - ratio) * jnp.log(neg_pred) * distance

    axes = (1, 2)  # sum over H, W -> [B, K]
    pos_sum = jnp.sum(jnp.where(pos, pos_term, 0.0), axis=axes)
    neg_sum = jnp.sum(jnp.where(pos, 0.0, neg_term), axis=axes)
    n_pos = jnp.sum(pos, axis=axes).astype(output.dtype)

    per_bk = jnp.where(
        n_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(n_pos, 1.0)
    )
    if target_weight is not None:
        per_bk = per_bk * (target_weight != 0)
    return jnp.sum(per_bk)


def mask_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    a: float = 0.5,
    thr: float = 0.2,
) -> jnp.ndarray:
    """Cross-entropy-style mask loss (reference: heatmapLoss.py:111-136)."""
    pos = target > thr
    pos_pred = jnp.clip(output + 1.0 - target, 1e-30, 1.0)
    neg_pred = jnp.clip(1.0 - output, 1e-30, 1.0)
    pos_loss = jnp.sum(jnp.where(pos, jnp.log(pos_pred), 0.0))
    neg_loss = jnp.sum(jnp.where(pos, 0.0, (1.0 - target) * jnp.log(neg_pred)))
    num = jnp.maximum(jnp.sum(pos), 1)
    return -1.0 * (pos_loss + a * neg_loss) / num


def region_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    a: float = 0.5,
    thr: float = 0.0,
) -> jnp.ndarray:
    """Width/height region-map loss with sqrt size weighting and a CIoU-like
    aspect-ratio term (reference: heatmapLoss.py:139-171).

    Args:
        output/target: [B, H, W, 2] (w-ratio, h-ratio channels).
    """
    const = 4.0 / (3.14159**2)
    pos = target > thr
    n_pos = jnp.sum(pos)

    pos_pred = jnp.clip(output, 1e-30, 1.0)
    neg_pred = jnp.clip(1.0 - output, 1e-30, 1.0)
    safe_t = jnp.where(pos, target, 1.0)
    pos_term = (jnp.sqrt(safe_t) - jnp.sqrt(pos_pred)) * jnp.log(
        pos_pred / safe_t
    )
    pos_loss = jnp.sum(jnp.where(pos, pos_term, 0.0))
    neg_loss = jnp.sum(jnp.where(pos, 0.0, jnp.log(neg_pred)))
    loss = -1.0 * (pos_loss + a * neg_loss) / jnp.maximum(n_pos, 1)

    # aspect-ratio term over positive patch pixels (masks of the two
    # channels coincide — both painted from the same center patch)
    m = pos[..., 0]
    pred_ratio = output[..., 0] / (output[..., 1] + 1e-6)
    gt_ratio = target[..., 0] / (target[..., 1] + 1e-6)
    diff = jnp.arctan(pred_ratio) - jnp.arctan(gt_ratio)
    aspect = const * diff**2
    aspect_mean = jnp.sum(jnp.where(m, aspect, 0.0)) / jnp.maximum(
        jnp.sum(m), 1
    )
    return jnp.where(n_pos == 0, 0.0, loss + aspect_mean)


def kl_discret_loss(
    pred_x: jnp.ndarray,
    pred_y: jnp.ndarray,
    target_x: jnp.ndarray,
    target_y: jnp.ndarray,
    target_weight: jnp.ndarray,
) -> jnp.ndarray:
    """Per-joint SimDR vector loss (reference: centernet_simdr_loss.py:6-39).

    The reference criterion reduces SmoothL1 to a scalar per joint, then
    multiplies by the per-sample weight and means — equivalent to
    scalar_j * mean(w_j); reproduced exactly.
    """
    K = pred_x.shape[1]
    lx = jnp.mean(_smooth_l1(pred_x, target_x), axis=(0, 2))  # [K]
    ly = jnp.mean(_smooth_l1(pred_y, target_y), axis=(0, 2))
    w_mean = jnp.mean(target_weight, axis=0)  # [K]
    return jnp.sum((lx + ly) * w_mean) / K


class KLDiscretLoss:
    """Functional alias matching the reference class name."""

    def __call__(self, px, py, tx, ty, w):
        return kl_discret_loss(px, py, tx, ty, w)


class SimDRLoss(nn.Module):
    """SimDR supervision with its own linear decoders
    (reference: centernet_simdr_loss.py:42-69): heatmaps are flattened and
    projected to 1-D x/y vectors by trainable Dense layers so any heatmap
    model can take SimDR supervision.
    """

    simdr_width: int
    simdr_height: int

    @classmethod
    def from_config(cls, cfg):
        k = cfg.PIPELINE.simdr_split_ratio
        return cls(
            simdr_width=int(k * cfg.DATASET.image_size[0]),
            simdr_height=int(k * cfg.DATASET.image_size[1]),
        )

    @nn.compact
    def __call__(self, heatmap, simdr_x, simdr_y, target_weight):
        B, H, W, K = heatmap.shape
        # flatten in torch [B, K, H*W] order (row-major over H, W)
        flat = jnp.transpose(heatmap, (0, 3, 1, 2)).reshape(B, K, H * W)
        pred_x = nn.Dense(self.simdr_width, name="x_decoder")(flat)
        pred_y = nn.Dense(self.simdr_height, name="y_decoder")(flat)
        return kl_discret_loss(pred_x, pred_y, simdr_x, simdr_y, target_weight)


class TopdownHeatmapLoss(nn.Module):
    """Primary criterion: balanced heatmap distance loss + optional SimDR
    (reference: loss/loss.py:69-114).

    ``auto_weight`` enables homoscedastic-uncertainty MTL weighting
    (loss_i / (2 p_i^2) + log(1 + p_i^2)); the reference declares the
    parameters but never applies them (loss.py:88-91) — here they are used.
    """

    loss_type: str = "L2"
    balance: bool = True
    loss_weight: Sequence[float] = (1.0, 0.1)
    auto_weight: bool = False
    simdr_split_ratio: float = 0.0
    simdr_width: int = 0
    simdr_height: int = 0

    @classmethod
    def from_config(cls, cfg):
        k = cfg.PIPELINE.get("simdr_split_ratio", 0)
        return cls(
            loss_type=cfg.LOSS.get("dl_type", "L2"),
            balance=cfg.MODEL.name != "atthandnet",
            loss_weight=tuple(cfg.LOSS.loss_weight),
            auto_weight=cfg.LOSS.get("auto_weight", False),
            simdr_split_ratio=k,
            simdr_width=int(k * cfg.DATASET.image_size[0]) if k else 0,
            simdr_height=int(k * cfg.DATASET.image_size[1]) if k else 0,
        )

    @nn.compact
    def __call__(self, output, batch):
        loss_dict = {}
        loss_dict["heatmap"] = distance_loss(
            output,
            batch["target"],
            batch["target_weight"],
            loss_type=self.loss_type,
            balance=self.balance,
        )
        if self.simdr_split_ratio > 0:
            loss_dict["simdr"] = SimDRLoss(
                self.simdr_width, self.simdr_height, name="simdr"
            )(output, batch["simdr_x"], batch["simdr_y"], batch["target_weight"])

        names = list(loss_dict)
        # loss_weight[i] applies in BOTH branches (the reference always
        # multiplies by loss_weight, loss/loss.py; its AutomaticWeightedLoss
        # params were declared but never trained — here the homoscedastic
        # weighting wraps the statically-weighted terms)
        for i, k in enumerate(names):
            loss_dict[k] = self.loss_weight[i] * loss_dict[k]
        if self.auto_weight:
            p = self.param(
                "mtl_p", nn.initializers.ones, (len(self.loss_weight),)
            )
            total = 0.0
            for i, k in enumerate(names):
                total = total + loss_dict[k] / (2.0 * p[i] ** 2) + jnp.log(
                    1.0 + p[i] ** 2
                )
        else:
            total = 0.0
            for k in names:
                total = total + loss_dict[k]
        return total, loss_dict


class SRHandNetLoss(nn.Module):
    """Multi-scale loss over SRHandNet's 4 outputs: balanced MSE on the
    21+1 keypoint/center channels + a second balanced term on the 2 w/h
    channels (reference: loss/loss.py:7-66).

    Replicated quirk: the reference's ``self.smoothl1_loss`` is constructed
    as ``DistanceLoss(reduction='mean')`` (loss/loss.py:16), which leaves
    ``loss_type`` at its **'L2' default** (heatmapLoss.py:229) — so despite
    the name, the w/h branch trains with MSE, and trained reference
    checkpoints embody that. Verified numerically against the reference
    criterion (tests/test_train_dynamics_parity.py srhandnet case).
    """

    loss_weight: Sequence[float] = (0.1, 0.2, 0.3, 0.4)
    with_region: bool = True
    num_kpt_channels: int = 22

    @classmethod
    def from_config(cls, cfg):
        out_c = cfg.MODEL.get("output_channel", 24)
        pred_bbox = cfg.MODEL.get("pred_bbox", False)
        return cls(
            loss_weight=tuple(cfg.LOSS.loss_weight),
            with_region=bool(pred_bbox and out_c == 24),
        )

    @nn.compact
    def __call__(self, outputs, batch):
        targets = batch["target"]
        target_weight = batch["target_weight"]
        assert len(outputs) == len(self.loss_weight)
        if self.with_region:
            kpt_loss, wh_loss = 0.0, 0.0
            nk = self.num_kpt_channels
            for i, out in enumerate(outputs):
                t = targets[i]
                w = (
                    target_weight[i]
                    if isinstance(target_weight, (list, tuple))
                    else target_weight
                )
                kpt_loss += (
                    distance_loss(out[..., :nk], t[..., :nk], w[..., :nk], "L2")
                    * self.loss_weight[i]
                )
                wh_loss += (
                    # "smoothl1_loss" reference-side is L2 (see class doc)
                    distance_loss(out[..., nk:], t[..., nk:], w[..., nk:], "L2")
                    * self.loss_weight[i]
                )
            return kpt_loss + wh_loss, {"kpt_loss": kpt_loss, "wh_loss": wh_loss}
        loss = 0.0
        for i, out in enumerate(outputs):
            w = (
                target_weight[i]
                if isinstance(target_weight, (list, tuple))
                else target_weight
            )
            loss += distance_loss(out, targets[i], w, "L2") * self.loss_weight[i]
        return loss, {"kpt_loss": loss}


def centernet_focal_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """CenterNet center-heatmap focal loss
    (reference: centernet_simdr_loss.py:73-107)."""
    pos = (target == 1.0).astype(pred.dtype)
    neg = (target < 1.0).astype(pred.dtype)
    neg_weights = (1.0 - target) ** 4
    p = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
    pos_loss = jnp.sum(jnp.log(p) * (1.0 - p) ** 2 * pos)
    neg_loss = jnp.sum(jnp.log(1.0 - p) * p**2 * neg_weights * neg)
    n_pos = jnp.sum(pos)
    return jnp.where(n_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(n_pos, 1.0))


def reg_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked L1 for w/h + offset maps (reference: centernet_simdr_loss.py:110-123)."""
    loss = jnp.sum(jnp.abs(pred * mask - target * mask))
    return loss / (jnp.sum(mask) + 1e-4)


class CenterSimdrLoss(nn.Module):
    """Gen-1 criterion for the stacked center-map + SimDR workflow
    (reference: train_distributed_center_simdr_freihand.py:196 with the loss
    pieces of loss/heatmapLoss.py + centernet_simdr_loss.py): per-stack
    balanced MSE on the K joint channels and the center channel, SmoothL1 on
    the w/h channels, weighted by ``hm_loss_factor``, plus the SimDR
    per-joint vector loss on the model's own pred_x/pred_y heads.
    """

    hm_loss_factor: Sequence[float] = (1.0, 1.0)
    num_joints: int = 21
    simdr_weight: float = 1.0

    @classmethod
    def from_config(cls, cfg):
        m = cfg.MODEL
        return cls(
            hm_loss_factor=tuple(m.get("hm_loss_factor", [1.0, 1.0])),
            num_joints=int(cfg.DATASET.num_joints),
            simdr_weight=float(cfg.LOSS.get("simdr_weight", 1.0)),
        )

    @nn.compact
    def __call__(self, outputs, batch):
        hm_preds, pred_x, pred_y = outputs
        target = batch["target"]            # [B, h, w, K+3]
        weight = batch["target_weight"]     # [B, K+3]
        K = self.num_joints
        loss_dict = {}
        hm_loss = 0.0
        for i, hm in enumerate(hm_preds):
            kpt = distance_loss(
                hm[..., :K + 1], target[..., :K + 1], weight[:, :K + 1], "L2"
            )
            wh = distance_loss(
                hm[..., K + 1:], target[..., K + 1:], weight[:, K + 1:],
                "SmoothL1",
            )
            hm_loss = hm_loss + (kpt + wh) * self.hm_loss_factor[i]
        loss_dict["heatmap"] = hm_loss
        if pred_x is not None and "simdr_x" in batch:
            loss_dict["simdr"] = self.simdr_weight * kl_discret_loss(
                pred_x, pred_y, batch["simdr_x"], batch["simdr_y"],
                weight[:, :K],
            )
        total = sum(loss_dict.values())
        return total, loss_dict
