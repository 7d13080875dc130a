"""MultiScaleAttentionHourglass ("mynet"), single-stage, NHWC.

Reference: models/pose_hg_ms_att.py:225-257 — pelee-style stem ->
EncoderDecoder hourglass with ME_att multi-scale attention blocks (dual-path
DWConv with dilation 1 and 2, two rounds, residual, 3x3-pooled channel
attention) -> BottleNeck features -> 1x1 head, optional leaky output
activation.
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


class PlainDWConv(nn.Module):
    """Plain depthwise-separable conv (reference: pose_hg_ms_att.py:7-23)."""

    features: int
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = Conv(
            C, 3, self.stride, self.padding, self.dilation, groups=C,
            use_bias=False, dtype=self.dtype, name="dw",
        )(x)
        x = BatchNorm(name="dw_bn", **kw)(x, train)
        x = jax.nn.relu(x)
        x = Conv(self.features, 1, use_bias=False, dtype=self.dtype, name="pw")(x)
        x = BatchNorm(name="pw_bn", **kw)(x, train)
        return jax.nn.relu(x)


class PlainBottleNeck(nn.Module):
    """1x1->3x3->1x1 residual, channel/4 mid (reference: pose_hg_ms_att.py:25-40)."""

    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        out = Conv(C // 4, 1, dtype=self.dtype, name="c1")(x)
        out = BatchNorm(name="bn1", **kw)(out, train)
        out = jax.nn.relu(out)
        out = Conv(C // 4, 3, 1, 1, dtype=self.dtype, name="c2")(out)
        out = BatchNorm(name="bn2", **kw)(out, train)
        out = jax.nn.relu(out)
        out = Conv(C, 1, dtype=self.dtype, name="c3")(out)
        out = BatchNorm(name="bn3", **kw)(out, train)
        return jax.nn.relu(x + out)


class PlainBasicBlock(nn.Module):
    """3x3 pair + projection skip (reference: pose_hg_ms_att.py:43-63)."""

    features: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        out = Conv(self.features, 3, self.stride, 1, dtype=self.dtype, name="c1")(x)
        out = BatchNorm(name="bn1", **kw)(out, train)
        out = jax.nn.relu(out)
        out = Conv(self.features, 3, 1, 1, dtype=self.dtype, name="c2")(out)
        out = BatchNorm(name="bn2", **kw)(out, train)
        if self.stride == 2 or x.shape[-1] != self.features:
            skip = Conv(
                self.features, 1, self.stride, 0, dtype=self.dtype, name="skip"
            )(x)
            skip = BatchNorm(name="skip_bn", **kw)(skip, train)
        else:
            skip = x
        return jax.nn.relu(skip + out)


class PlainResidual(nn.Module):
    """BasicBlock + BottleNecks (reference: pose_hg_ms_att.py:65-74)."""

    features: int
    stride: int = 1
    num_block: int = 2
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = PlainBasicBlock(self.features, self.stride, name="c1", **kw)(x, train)
        for i in range(self.num_block):
            x = PlainBottleNeck(name=f"b{i}", **kw)(x, train)
        return x


class BRC(nn.Module):
    """BN -> SiLU -> Conv (reference: pose_hg_ms_att.py:76-90)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(self.axis_name, dtype=self.dtype, name="norm")(x, train)
        x = jax.nn.silu(x)
        return Conv(
            self.features, self.kernel, self.stride, self.padding,
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)


class MEAtt(nn.Module):
    """Multi-scale attention block (reference: pose_hg_ms_att.py:135-187).

    The gate here is BN -> ReLU over a 3x3 pooled map, depthwise 3x3 to
    1x1, then Dropout + Linear + sigmoid.
    """

    features: int
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        mid_c = in_c // 2
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)

        m = BRC(mid_c, 1, 1, 0, name="conv1", **kw)(x, train)
        for i in range(2):
            c_out = mid_c // 2 if i == 0 else mid_c
            m1 = PlainDWConv(c_out, name=f"p1_{i}_a", **kw)(m, train)
            m1 = PlainDWConv(c_out, name=f"p1_{i}_b", **kw)(m1, train)
            m2 = PlainDWConv(
                c_out, dilation=2, padding=2, name=f"p2_{i}_a", **kw
            )(m, train)
            m2 = PlainDWConv(c_out, name=f"p2_{i}_b", **kw)(m2, train)
            m = jnp.concatenate([m1, m2], axis=-1)

        features = m + x
        out = BRC(self.features, 1, 1, 0, name="conv2", **kw)(features, train)

        att = adaptive_avg_pool(out, (3, 3))
        att = BatchNorm(name="att_bn", **kw)(att, train)
        att = jax.nn.relu(att)
        att = Conv(
            self.features, 3, 1, 0, groups=self.features, dtype=self.dtype,
            name="att_conv",
        )(att)  # [B, 1, 1, C]
        att = att.reshape(att.shape[0], -1)
        att = nn.Dropout(rate=0.3, deterministic=not train)(att)
        att = nn.Dense(self.features, name="att_fc")(att)
        att = jax.nn.sigmoid(att)
        return out * att[:, None, None, :]


class PeleeStem(nn.Module):
    """Stride-4 stem (reference: pose_hg_ms_att.py:190-222)."""

    features: int = 256
    min_mid: int = 32
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(self.features // 4, self.min_mid)
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = Conv(mid, 3, 2, 1, use_bias=False, dtype=self.dtype, name="c1")(x)
        x = BatchNorm(name="bn1", **kw)(x, train)
        x = leaky_relu(x)
        x = Conv(mid, 3, 1, 1, groups=mid, use_bias=False, dtype=self.dtype, name="c2")(x)
        x = BatchNorm(name="bn2", **kw)(x, train)
        x = leaky_relu(x)
        b1 = Conv(mid, 1, dtype=self.dtype, name="b1a")(x)
        b1 = BatchNorm(name="b1a_bn", **kw)(b1, train)
        b1 = jax.nn.relu(b1)
        b1 = Conv(mid, 3, 2, 1, dtype=self.dtype, name="b1b")(b1)
        b1 = BatchNorm(name="b1b_bn", **kw)(b1, train)
        b1 = jax.nn.relu(b1)
        b2 = max_pool2(x)
        out = jnp.concatenate([b1, b2], axis=-1)
        return Conv(self.features, 1, dtype=self.dtype, name="proj")(out)


class MSAttEncoderDecoder(nn.Module):
    """Hourglass with ME_att entry/exit (reference: pose_hg_ms_att.py:93-132)."""

    num_levels: int = 4
    features: int = 128
    num_blocks: Sequence[int] = (2, 2, 2)
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.num_blocks) == self.num_levels - 1
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)

        out_encoder = []
        x = MEAtt(self.features, name="enc0", **kw)(x, train)
        out_encoder.append(x)
        for i in range(self.num_levels - 1):
            x = PlainResidual(
                self.features, 2, self.num_blocks[i], name=f"enc{i + 1}", **kw
            )(x, train)
            out_encoder.append(x)

        h, w = out_encoder[-1].shape[1:3]
        shortcut = adaptive_avg_pool(out_encoder[0], (h, w))

        out_decoder = []
        for i in range(self.num_levels):
            counterpart = out_encoder[self.num_levels - 1 - i]
            if i < self.num_levels - 1:
                layer = PlainResidual(
                    self.features, 1, 2, name=f"dec{i}", **kw
                )
            else:
                layer = MEAtt(self.features, name=f"dec{i}", **kw)
            if i == 0:
                x = layer(counterpart, train) + shortcut
            else:
                x = layer(x, train)
                ch, cw = counterpart.shape[1:3]
                x = resize_nearest(x, (ch, cw)) + counterpart
            out_decoder.append(x)
        return tuple(out_decoder)


class MSAttHourglass(nn.Module):
    """Single-stage mynet (reference: pose_hg_ms_att.py:225-257)."""

    num_joints: int = 21
    num_stage: int = 4
    features: int = 128
    num_blocks: Sequence[int] = (2, 2, 2)
    with_activation: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy
        m = cfg.MODEL
        return cls(
            num_joints=m.get("output_channel", cfg.DATASET.num_joints),
            num_stage=m.get("num_stage", 4),
            features=m.get("input_channel", 128),
            num_blocks=tuple(m.get("num_block", [2, 2, 2])),
            with_activation=m.get("output_acitivation", False),
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = PeleeStem(self.features, name="pre", **kw)(imgs, train)
        hg = MSAttEncoderDecoder(
            self.num_stage, self.features, self.num_blocks, name="hgs", **kw
        )(x, train)
        f = PlainBottleNeck(name="feat_b", **kw)(hg[-1], train)
        f = Conv(self.features, 1, dtype=self.dtype, name="feat_c")(f)
        f = BatchNorm(self.axis_name, dtype=self.dtype, name="feat_bn")(f, train)
        f = leaky_relu(f)
        preds = Conv(self.num_joints, 1, dtype=self.dtype, name="outs")(f)
        preds = preds.astype(jnp.float32)
        if self.with_activation:
            preds = jax.nn.leaky_relu(preds, 0.5)
        return preds
