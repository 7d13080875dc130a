"""Classic stacked hourglass (princeton-vl lineage), NHWC.

Reference: models/pose_estimation/hourglassnet.py:1-137. Pre (7x7-s2 conv,
residuals, pool) -> num_stack x (recursive depth-n HourglassModule ->
features -> 1x1 out), with merge connections between stacks. Returns
[B, num_stack, H/4, W/4, K] stacked heatmaps (channels-last).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import BatchNorm, Conv, max_pool2, resize_nearest


class HgConv(nn.Module):
    """conv(+BN)(+ReLU) with biased conv (reference: hourglassnet.py:6-25)."""

    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = False
    relu: bool = True
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = Conv(
            self.features, self.kernel, self.stride, pad, use_bias=True,
            dtype=self.dtype, name="conv",
        )(x)
        if self.bn:
            x = BatchNorm(self.axis_name, dtype=self.dtype, name="norm")(x, train)
        if self.relu:
            x = jax.nn.relu(x)
        return x


class HgResidual(nn.Module):
    """Pre-activation bottleneck residual (reference: hourglassnet.py:27-54)."""

    features: int
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        if x.shape[-1] == self.features:
            residual = x
        else:
            residual = HgConv(
                self.features, 1, relu=False, name="skip", **kw
            )(x, train)
        out = BatchNorm(name="bn1", **kw)(x, train)
        out = jax.nn.relu(out)
        out = HgConv(half, 1, relu=False, name="c1", **kw)(out, train)
        out = BatchNorm(name="bn2", **kw)(out, train)
        out = jax.nn.relu(out)
        out = HgConv(half, 3, relu=False, name="c2", **kw)(out, train)
        out = BatchNorm(name="bn3", **kw)(out, train)
        out = jax.nn.relu(out)
        out = HgConv(self.features, 1, relu=False, name="c3", **kw)(out, train)
        return out + residual


class HourglassModule(nn.Module):
    """Recursive hourglass (reference: hourglassnet.py:56-80)."""

    depth: int
    features: int
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        up1 = HgResidual(self.features, name="up1", **kw)(x, train)
        low = max_pool2(x)
        low = HgResidual(self.features, name="low1", **kw)(low, train)
        if self.depth > 1:
            low = HourglassModule(
                self.depth - 1, self.features, name="low2", **kw
            )(low, train)
        else:
            low = HgResidual(self.features, name="low2", **kw)(low, train)
        low = HgResidual(self.features, name="low3", **kw)(low, train)
        h, w = up1.shape[1:3]
        return up1 + resize_nearest(low, (h, w))


class HourglassNet(nn.Module):
    """Stacked hourglass (reference: hourglassnet.py:90-136)."""

    num_joints: int = 21
    num_stack: int = 2
    num_level: int = 4
    features: int = 256
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy
        m = cfg.MODEL
        return cls(
            num_joints=m.get("output_channel", cfg.DATASET.num_joints),
            num_stack=m.get("num_stack", 8),
            num_level=m.get("num_level", 4),
            features=m.get("input_channel", 256),
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = HgConv(64, 7, 2, bn=True, relu=True, name="pre0", **kw)(imgs, train)
        x = HgResidual(128, name="pre1", **kw)(x, train)
        x = max_pool2(x)
        x = HgResidual(128, name="pre2", **kw)(x, train)
        x = HgResidual(self.features, name="pre3", **kw)(x, train)

        outs = []
        for i in range(self.num_stack):
            hg = HourglassModule(
                self.num_level, self.features, name=f"hg{i}", **kw
            )(x, train)
            feat = HgResidual(self.features, name=f"feat{i}_res", **kw)(hg, train)
            feat = HgConv(
                self.features, 1, bn=True, relu=True, name=f"feat{i}_conv", **kw
            )(feat, train)
            preds = HgConv(
                self.num_joints, 1, bn=False, relu=False, name=f"out{i}", **kw
            )(feat, train)
            outs.append(preds.astype(jnp.float32))
            if i < self.num_stack - 1:
                x = (
                    x
                    + HgConv(
                        self.features, 1, bn=False, relu=False,
                        name=f"merge_pred{i}", **kw,
                    )(preds.astype(x.dtype), train)
                    + HgConv(
                        self.features, 1, bn=False, relu=False,
                        name=f"merge_feat{i}", **kw,
                    )(feat, train)
                )
        return jnp.stack(outs, axis=1)  # [B, num_stack, H, W, K]
