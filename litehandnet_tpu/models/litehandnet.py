"""LiteHandNet — the flagship lightweight hourglass with multi-scale
attention and re-parameterizable convolutions.

TPU-native NHWC re-design of the reference architecture
(models/pose_estimation/liteHandNet/liteHandNet.py:8-244): Stem (RepBlock
3x3-s2 + 7x7 depthwise, dual-branch downsample) -> single encoder-decoder
hourglass with MSAB multi-scale-attention blocks at entry/exit -> BottleNeck
features -> 1x1 head. Every RepConv/RepBlock/ChannelAttention fuses into a
single conv via `reparam.fuse_params` for deployment (``deploy=True``).

Input [B, H, W, 3] -> heatmaps [B, H/4, W/4, K].
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import (
    Activation,
    repconv_act,
    ChannelAttention,
    Conv,
    RepBlock,
    RepConv,
    SEBlock,
    adaptive_avg_pool,
    get_activation,
    leaky_relu,
    max_pool2,
    resize_nearest,
)


class DWConv(nn.Module):
    """Depthwise-separable conv from RepConvs (reference: liteHandNet.py:8-21)."""

    features: int
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    act: Activation = leaky_relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        act = repconv_act(self.act, inplace=False)  # liteHandNet.py:14-17
        x = RepConv(
            C, 3, self.stride, self.padding, self.dilation, groups=C,
            act=act, name="dw", **kw,
        )(x, train)
        x = RepConv(self.features, 1, 1, 0, act=act, name="pw", **kw)(x, train)
        return x


class BottleNeck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual bottleneck (reference: liteHandNet.py:23-37)."""

    features: int
    reduction: int = 4
    act: Activation = leaky_relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // self.reduction
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        act = repconv_act(self.act, inplace=True)  # liteHandNet.py:28-33
        out = RepConv(mid, 1, 1, 0, act=act, name="c1", **kw)(x, train)
        out = RepConv(mid, 3, 1, 1, act=act, name="c2", **kw)(out, train)
        out = RepConv(self.features, 1, 1, 0, act=None, name="c3", **kw)(out, train)
        return self.act(x + out)


class BasicBlock(nn.Module):
    """3x3 pair + projection skip (reference: liteHandNet.py:39-54)."""

    features: int
    stride: int = 1
    act: Activation = leaky_relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        out = RepConv(
            self.features, 3, self.stride, 1,
            act=repconv_act(self.act, inplace=True),  # liteHandNet.py:42-47
            name="c1", **kw,
        )(x, train)
        out = RepConv(self.features, 3, 1, 1, act=None, name="c2", **kw)(out, train)
        if self.stride == 2 or x.shape[-1] != self.features:
            skip = RepConv(
                self.features, 1, self.stride, 0, act=None, name="skip", **kw
            )(x, train)
        else:
            skip = x
        return self.act(skip + out)


class Residual(nn.Module):
    """BasicBlock + BottleNeck stack (reference: liteHandNet.py:57-68)."""

    features: int
    stride: int = 2
    num_block: int = 2
    reduction: int = 2
    act: Activation = leaky_relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(
            act=self.act, deploy=self.deploy, axis_name=self.axis_name,
            dtype=self.dtype,
        )
        x = BasicBlock(self.features, self.stride, name="c1", **kw)(x, train)
        for i in range(self.num_block):
            x = BottleNeck(
                self.features, self.reduction, name=f"b{i}", **kw
            )(x, train)
        return x


class MSAB(nn.Module):
    """Multi-scale attention block: split-channel dual-dilation DWConv paths,
    two rounds, residual, channel attention (reference: liteHandNet.py:116-166).
    """

    features: int
    ca_type: str = "ca"
    act: Activation = leaky_relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        mid_c = in_c // 2
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        dkw = dict(act=self.act, **kw)

        msab_act = repconv_act(self.act, inplace=True)  # liteHandNet.py:124,145
        m = RepConv(mid_c, 1, 1, 0, act=msab_act, name="conv1", **kw)(x, train)
        for i in range(2):
            # path 1: plain DWConv pair -> mid_c//2 (i=0) or mid_c (i=1)
            c_out = mid_c // 2 if i == 0 else mid_c
            m1 = DWConv(c_out, name=f"p1_{i}_a", **dkw)(m, train)
            m1 = DWConv(c_out, name=f"p1_{i}_b", **dkw)(m1, train)
            # path 2: dilated DWConv then plain
            m2 = DWConv(
                c_out, dilation=2, padding=2, name=f"p2_{i}_a", **dkw
            )(m, train)
            m2 = DWConv(c_out, name=f"p2_{i}_b", **dkw)(m2, train)
            m = jnp.concatenate([m1, m2], axis=-1)

        features = m + x
        out = RepConv(
            self.features, 1, 1, 0, act=msab_act, name="conv2", **kw
        )(features, train)
        if self.ca_type == "se":
            out = SEBlock(max(self.features // 16, 1), dtype=self.dtype, name="ca")(
                out, train
            )
        elif self.ca_type == "ca":
            out = ChannelAttention(
                deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype,
                name="ca",
            )(out, train)
        return out


class Stem(nn.Module):
    """Stride-4 stem with dual-branch downsample (reference: liteHandNet.py:169-193)."""

    features: int = 256
    min_mid: int = 32
    act: Activation = leaky_relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(self.features // 4, self.min_mid)
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        x = RepBlock(mid, 3, 2, 1, act=self.act, name="c1", **kw)(x, train)
        x = RepBlock(
            mid, 7, 1, 3, groups=mid, act=self.act, name="c2", **kw
        )(x, train)
        b_act = repconv_act(self.act, inplace=True)  # liteHandNet.py:181-184
        b1 = RepConv(mid, 1, 1, 0, act=b_act, name="b1a", **kw)(x, train)
        b1 = RepConv(mid, 3, 2, 1, act=b_act, name="b1b", **kw)(b1, train)
        b2 = max_pool2(x)
        out = jnp.concatenate([b1, b2], axis=-1)
        return Conv(self.features, 1, use_bias=True, dtype=self.dtype, name="proj")(out)


class EncoderDecoder(nn.Module):
    """Single hourglass with MSAB at entry/exit and a global average-pooled
    shortcut into the bottleneck (reference: liteHandNet.py:71-113).
    """

    num_levels: int = 4
    features: int = 128
    num_blocks: Sequence[int] = (2, 2, 2)
    ca_type: str = "ca"
    reduction: int = 2
    act: Activation = leaky_relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.num_blocks) == self.num_levels - 1
        kw = dict(
            act=self.act, deploy=self.deploy, axis_name=self.axis_name,
            dtype=self.dtype,
        )
        mkw = dict(ca_type=self.ca_type, **kw)

        out_encoder = []
        x = MSAB(self.features, name="enc0", **mkw)(x, train)
        out_encoder.append(x)
        for i in range(self.num_levels - 1):
            x = Residual(
                self.features, 2, self.num_blocks[i], self.reduction,
                name=f"enc{i + 1}", **kw,
            )(x, train)
            out_encoder.append(x)

        h, w = out_encoder[-1].shape[1:3]
        shortcut = adaptive_avg_pool(out_encoder[0], (h, w))

        out_decoder = []
        for i in range(self.num_levels):
            counterpart = out_encoder[self.num_levels - 1 - i]
            if i < self.num_levels - 1:
                layer = Residual(
                    self.features, 1, self.num_blocks[i], self.reduction,
                    name=f"dec{i}", **kw,
                )
            else:
                layer = MSAB(self.features, name=f"dec{i}", **mkw)
            if i == 0:
                x = layer(counterpart, train) + shortcut
            else:
                x = layer(x, train)
                ch, cw = counterpart.shape[1:3]
                x = resize_nearest(x, (ch, cw)) + counterpart
            out_decoder.append(x)
        return tuple(out_decoder)


class LiteHandNet(nn.Module):
    """Flagship model (reference: liteHandNet.py:196-244).

    Config keys (cfg.MODEL): num_stage, input_channel, output_channel,
    num_block, ca_type in {ca, se, none}, reduction in {2, 4}, activation.
    """

    num_joints: int = 21
    num_stage: int = 4
    features: int = 128
    num_blocks: Sequence[int] = (2, 2, 2)
    ca_type: str = "ca"
    reduction: int = 2
    activation: str = "leakyrelu"
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        m = cfg.MODEL
        return cls(
            num_joints=m.get("output_channel", cfg.DATASET.num_joints),
            num_stage=m.get("num_stage", 4),
            features=m.get("input_channel", 128),
            num_blocks=tuple(m.get("num_block", [2, 2, 2])),
            ca_type=m.get("ca_type", "ca"),
            reduction=m.get("reduction", 2),
            activation=m.get("activation", "leakyrelu"),
            deploy=deploy,
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        act = get_activation(self.activation)
        kw = dict(
            act=act, deploy=self.deploy, axis_name=self.axis_name,
            dtype=self.dtype,
        )
        x = Stem(self.features, name="pre", **kw)(imgs, train)
        hg = EncoderDecoder(
            self.num_stage, self.features, self.num_blocks, self.ca_type,
            self.reduction, name="hgs", **kw,
        )(x, train)
        f = BottleNeck(self.features, 2, name="feat_b", **kw)(hg[-1], train)
        fkw = dict(kw, act=repconv_act(act, inplace=True))  # liteHandNet.py:224
        f = RepConv(self.features, 1, 1, 0, name="feat_c", **fkw)(f, train)
        out = Conv(
            self.num_joints, 1, use_bias=True, dtype=self.dtype, name="head"
        )(f)
        return out.astype(jnp.float32)
