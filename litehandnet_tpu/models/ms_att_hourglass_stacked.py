"""Stacked MultiScaleAttentionHourglass (Gen-1 "mynet" variant) with region
maps and SimDR heads, NHWC.

Reference: models/pose_estimation/pose_hg_ms_att.py:68-265 — nstack x
recursive Hourglass (MultiScaleAttentionBlock at the top level, pre-act
Residual inside), intermediate supervision with merge_preds/merge_features,
and optional SimDR linear heads pred_x/pred_y from the final heatmap.
Returns (hm_preds list, pred_x, pred_y) when SimDR is on, else the list.
Output channels = n_joints + 3 when with_region_map (center + w/h maps).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import (
    BatchNorm,
    Conv,
    adaptive_avg_pool,
    leaky_relu,
    max_pool2,
    resize_nearest,
)
from litehandnet_tpu.models.ms_att_hourglass import PlainDWConv


class PreActResidual(nn.Module):
    """BN-ReLU bottleneck residual (reference: pose_hg_ms_att.py:26-49)."""

    features: int
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        if x.shape[-1] == self.features:
            skip = x
        else:
            skip = Conv(self.features, 1, dtype=self.dtype, name="skip")(x)
        out = BatchNorm(name="bn1", **kw)(x, train)
        out = jax.nn.relu(out)
        out = Conv(half, 1, dtype=self.dtype, name="c1")(out)
        out = BatchNorm(name="bn2", **kw)(out, train)
        out = jax.nn.relu(out)
        out = Conv(half, 3, 1, 1, dtype=self.dtype, name="c2")(out)
        out = BatchNorm(name="bn3", **kw)(out, train)
        out = jax.nn.relu(out)
        out = Conv(self.features, 1, dtype=self.dtype, name="c3")(out)
        return skip + out


class MSAttBlock(nn.Module):
    """MultiScaleAttentionBlock (reference: pose_hg_ms_att.py:96-148) —
    BRC(ReLU flavor) + dual-path DWConvs + RCA-style gate."""

    features: int
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        mid_c = in_c // 2
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)

        def brc(z, feats, name):
            # BRC conv is biasless (pose_hg_ms_att.py:52-66, bias=False)
            z = BatchNorm(name=f"{name}_bn", **kw)(z, train)
            z = jax.nn.relu(z)
            return Conv(
                feats, 1, use_bias=False, dtype=self.dtype,
                name=f"{name}_conv",
            )(z)

        m = brc(x, mid_c, "conv1")
        for i in range(2):
            c_out = mid_c // 2 if i == 0 else mid_c
            m1 = PlainDWConv(c_out, name=f"p1_{i}_a", **kw)(m, train)
            m1 = PlainDWConv(c_out, name=f"p1_{i}_b", **kw)(m1, train)
            m2 = PlainDWConv(
                c_out, dilation=2, padding=2, name=f"p2_{i}_a", **kw
            )(m, train)
            m2 = PlainDWConv(c_out, name=f"p2_{i}_b", **kw)(m2, train)
            m = jnp.concatenate([m1, m2], axis=-1)

        out = brc(m + x, self.features, "conv2")
        att = adaptive_avg_pool(out, (3, 3))
        att = BatchNorm(name="att_bn", **kw)(att, train)
        att = jax.nn.relu(att)
        att = Conv(
            self.features, 3, 1, 0, groups=self.features, dtype=self.dtype,
            name="att_conv",
        )(att)
        att = att.reshape(att.shape[0], -1)
        att = nn.Dropout(0.3, deterministic=not train)(att)
        att = nn.Dense(self.features, name="att_fc")(att)
        return out * jax.nn.sigmoid(att)[:, None, None, :]


class RecursiveHourglass(nn.Module):
    """Reference: pose_hg_ms_att.py:68-94. `top_block` only at depth n."""

    depth: int
    features: int
    increase: int = 0
    top_attention: bool = True
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.features + self.increase
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        Block = MSAttBlock if self.top_attention else PreActResidual
        up1 = Block(self.features, name="up1", **kw)(x, train)
        low = max_pool2(x)
        low = Block(nf, name="low1", **kw)(low, train)
        if self.depth > 1:
            low = RecursiveHourglass(
                self.depth - 1, nf, 0, top_attention=False, name="low2", **kw
            )(low, train)
        else:
            low = Block(nf, name="low2", **kw)(low, train)
        low = Block(self.features, name="low3", **kw)(low, train)
        h, w = up1.shape[1:3]
        return up1 + resize_nearest(low, (h, w))


class MSAttHourglassStacked(nn.Module):
    """Reference: pose_hg_ms_att.py:188-265."""

    num_joints: int = 21
    nstack: int = 2
    features: int = 128
    hg_depth: int = 4
    increase: int = 0
    with_region_map: bool = True
    simdr_split_ratio: float = 2.0
    image_size: Sequence[int] = (256, 256)
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy
        m = cfg.MODEL
        pipeline = cfg.get("PIPELINE", {})
        return cls(
            num_joints=cfg.DATASET.num_joints,
            nstack=len(m.get("hm_loss_factor", [1.0, 1.0])),
            features=m.get("main_channels", m.get("input_channel", 128)),
            hg_depth=m.get("hg_depth", 4),
            increase=m.get("increase", 0),
            with_region_map=m.get("with_region_map", True),
            simdr_split_ratio=m.get(
                "simdr_split_ratio", pipeline.get("simdr_split_ratio", 2)
            ),
            image_size=tuple(cfg.DATASET.image_size),
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        oup_dim = self.num_joints + 3 if self.with_region_map else self.num_joints
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        mid = max(self.features // 4, 32)

        # pelee stem with BN+ReLU on the projection
        # (reference: pose_hg_ms_att.py:150-186)
        x = Conv(mid, 3, 2, 1, use_bias=False, dtype=self.dtype, name="pre_c1")(imgs)
        x = BatchNorm(name="pre_bn1", **kw)(x, train)
        x = leaky_relu(x)
        x = Conv(mid, 3, 1, 1, groups=mid, use_bias=False, dtype=self.dtype, name="pre_c2")(x)
        x = BatchNorm(name="pre_bn2", **kw)(x, train)
        x = leaky_relu(x)
        b1 = Conv(mid, 1, dtype=self.dtype, name="pre_b1a")(x)
        b1 = BatchNorm(name="pre_b1a_bn", **kw)(b1, train)
        b1 = jax.nn.relu(b1)
        b1 = Conv(mid, 3, 2, 1, dtype=self.dtype, name="pre_b1b")(b1)
        b1 = BatchNorm(name="pre_b1b_bn", **kw)(b1, train)
        b1 = jax.nn.relu(b1)
        b2 = max_pool2(x)
        x = Conv(
            self.features, 1, dtype=self.dtype, name="pre_proj"
        )(jnp.concatenate([b1, b2], axis=-1))
        x = BatchNorm(name="pre_proj_bn", **kw)(x, train)
        x = jax.nn.relu(x)

        hm_preds = []
        feature = x
        for i in range(self.nstack):
            hg = RecursiveHourglass(
                self.hg_depth, self.features, self.increase, name=f"hg{i}", **kw
            )(x, train)
            feature = PreActResidual(self.features, name=f"feat{i}_res", **kw)(
                hg, train
            )
            feature = BatchNorm(name=f"feat{i}_bn", **kw)(feature, train)
            feature = jax.nn.relu(feature)
            feature = Conv(
                self.features, 1, dtype=self.dtype, name=f"feat{i}_conv"
            )(feature)
            preds = Conv(oup_dim, 1, dtype=self.dtype, name=f"out{i}")(feature)
            hm_preds.append(preds.astype(jnp.float32))
            if i < self.nstack - 1:
                x = (
                    x
                    + Conv(
                        self.features, 1, dtype=self.dtype,
                        name=f"merge_pred{i}",
                    )(preds.astype(x.dtype))
                    + Conv(
                        self.features, 1, dtype=self.dtype,
                        name=f"merge_feat{i}",
                    )(feature)
                )

        if self.simdr_split_ratio > 0:
            k = self.simdr_split_ratio
            kpts = hm_preds[-1][..., : self.num_joints]  # drop region channels
            # resize to the configured heatmap size so the SimDR Dense heads
            # stay valid for reduced-size cycle-detection crops (the
            # reference's intent at pose_hg_ms_att.py:252-254)
            hm_w, hm_h = self.image_size[0] // 4, self.image_size[1] // 4
            if kpts.shape[1:3] != (hm_h, hm_w):
                kpts = resize_nearest(kpts, (hm_h, hm_w))
            B, H, W, K = kpts.shape
            flat = jnp.transpose(kpts, (0, 3, 1, 2)).reshape(B, K, H * W)
            pred_x = nn.Dense(int(self.image_size[0] * k), name="pred_x")(flat)
            pred_y = nn.Dense(int(self.image_size[1] * k), name="pred_y")(flat)
            return hm_preds, pred_x, pred_y
        return hm_preds
