"""SimpleBaseline: ResNet / MobileNetV2 backbone + deconv head (NHWC).

Reference: models/pose_estimation/SimpleBaseline/{resnet.py, mobilenetv2.py,
deconv_head.py} — "Simple Baselines for Human Pose Estimation" (Xiao et al.).
Backbone -> 3x (ConvTranspose 4x4 s2 + BN + ReLU) -> 1x1 head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import BatchNorm, Conv


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


class CBL(nn.Module):
    """Conv + BN + ReLU6 (reference: resnet.py:5-16)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(
            self.features, self.kernel, self.stride, self.padding,
            groups=self.groups, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = BatchNorm(self.axis_name, dtype=self.dtype, name="norm")(x, train)
        return relu6(x)


class ResBasicBlock(nn.Module):
    """3x3 pair + BN skip (reference: resnet.py:37-49)."""

    features: int
    stride: int = 1
    project: bool = False
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
        if self.project:
            skip = Conv(
                self.features, 1, self.stride, 0, use_bias=False,
                dtype=self.dtype, name="down",
            )(x)
            skip = BatchNorm(name="down_bn", **kw)(skip, train)
        else:
            skip = x
        return jax.nn.relu(skip + out)


class ResBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 with in/4 mid channels (reference: resnet.py:19-34).

    Note the reference's non-standard design: mid channels derive from the
    *input* channel count, not the output.
    """

    features: int
    stride: int = 1
    project: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 4
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        out = Conv(mid, 1, 1, 0, dtype=self.dtype, name="c1")(x)
        out = BatchNorm(name="bn1", **kw)(out, train)
        out = jax.nn.relu(out)
        out = Conv(mid, 3, self.stride, 1, dtype=self.dtype, name="c2")(out)
        out = BatchNorm(name="bn2", **kw)(out, train)
        out = jax.nn.relu(out)
        out = Conv(self.features, 1, 1, 0, dtype=self.dtype, name="c3")(out)
        out = BatchNorm(name="bn3", **kw)(out, train)
        if self.project:
            skip = Conv(
                self.features, 1, self.stride, 0, use_bias=False,
                dtype=self.dtype, name="down",
            )(x)
            skip = BatchNorm(name="down_bn", **kw)(skip, train)
        else:
            skip = x
        return jax.nn.relu(skip + out)


class DeconvHead(nn.Module):
    """3x deconv(4x4, s2) + BN + ReLU then 1x1 conv
    (reference: deconv_head.py:19-129)."""

    out_channels: int
    num_deconv_layers: int = 3
    num_deconv_filters: Sequence[int] = (256, 256, 256)
    final_conv_kernel: int = 1
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_deconv_layers):
            x = nn.ConvTranspose(
                self.num_deconv_filters[i], (4, 4), strides=(2, 2),
                padding="SAME", use_bias=False, dtype=self.dtype,
                name=f"deconv{i}",
            )(x)
            x = BatchNorm(self.axis_name, dtype=self.dtype, name=f"bn{i}")(
                x, train
            )
            x = jax.nn.relu(x)
        pad = (self.final_conv_kernel - 1) // 2
        return Conv(
            self.out_channels, self.final_conv_kernel, 1, pad,
            dtype=self.dtype, name="final",
        )(x)


class PoseResNet(nn.Module):
    """ResNet-{18,34,50,101,152} + DeconvHead (reference: resnet.py:86-171)."""

    depth: int = 50
    num_joints: int = 21
    stem_channels: int = 64
    base_channels: int = 64
    strides: Sequence[int] = (1, 2, 2, 2)
    deep_stem: bool = False
    num_stages: int = 4
    axis_name: Optional[str] = None
    dtype: Any = None

    ARCH = {
        18: ("basic", (2, 2, 2, 2)),
        34: ("basic", (3, 4, 6, 3)),
        50: ("bottleneck", (3, 4, 6, 3)),
        101: ("bottleneck", (3, 4, 23, 3)),
        152: ("bottleneck", (3, 8, 36, 3)),
    }

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy  # no rep branches in this family
        m = cfg.MODEL
        return cls(
            depth=m.get("depth", 50),
            num_joints=m.get("output_channel", cfg.DATASET.num_joints),
            stem_channels=m.get("stem_channels", 64),
            base_channels=m.get("base_channels", 64),
            strides=tuple(m.get("strides", (1, 2, 2, 2))),
            deep_stem=m.get("deep_stem", False),
            num_stages=m.get("num_stages", 4),
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stage_blocks = self.ARCH[self.depth]
        expansion = 1 if block_kind == "basic" else 4
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)

        if self.deep_stem:
            x = CBL(self.stem_channels // 2, 3, 2, 1, name="stem0", **kw)(x, train)
            x = CBL(self.stem_channels // 2, 3, 1, 1, name="stem1", **kw)(x, train)
            x = CBL(self.stem_channels, 3, 1, 1, name="stem2", **kw)(x, train)
        else:
            x = CBL(self.stem_channels, 7, 2, 3, name="stem", **kw)(x, train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        Block = ResBasicBlock if block_kind == "basic" else ResBottleneck
        out_ch = self.base_channels * expansion
        for stage in range(self.num_stages):
            n_blocks = stage_blocks[stage]
            for b in range(n_blocks):
                stride = self.strides[stage] if b == 0 else 1
                project = b == 0 and (stride != 1 or x.shape[-1] != out_ch)
                x = Block(
                    out_ch, stride, project, name=f"layer{stage}_{b}", **kw
                )(x, train)
            out_ch *= 2

        return DeconvHead(
            self.num_joints, name="head", **kw
        )(x, train).astype(jnp.float32)


def make_divisible(value, divisor, min_value=None, min_ratio=0.9):
    """Channel rounding (reference: mobilenetv2.py:6-29)."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < min_ratio * value:
        new_value += divisor
    return new_value


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (reference: mobilenetv2.py:45-71)."""

    features: int
    stride: int
    expand_ratio: int
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        out = x
        if self.expand_ratio != 1:
            out = CBL(hidden, name="expand", **kw)(out, train)
        out = CBL(
            hidden, 3, self.stride, 1, groups=hidden, name="dw", **kw
        )(out, train)
        out = CBL(self.features, name="project", **kw)(out, train)
        if self.stride == 1 and in_ch == self.features:
            return x + out
        return out


class PoseMobileNetV2(nn.Module):
    """MobileNetV2 + DeconvHead (reference: mobilenetv2.py:74-189)."""

    num_joints: int = 21
    widen_factor: float = 1.0
    axis_name: Optional[str] = None
    dtype: Any = None

    ARCH = (
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
    )

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy
        m = cfg.MODEL
        return cls(
            num_joints=m.get("output_channel", cfg.DATASET.num_joints),
            widen_factor=m.get("widen_factor", 1.0),
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = CBL(
            make_divisible(32 * self.widen_factor, 8), 3, 2, 1,
            name="conv1", **kw,
        )(x, train)
        for i, (expand, channel, blocks, stride) in enumerate(self.ARCH):
            out_ch = make_divisible(channel * self.widen_factor, 8)
            for b in range(blocks):
                x = InvertedResidual(
                    out_ch, stride if b == 0 else 1, expand,
                    name=f"layer{i + 1}_{b}", **kw,
                )(x, train)
        out_ch = int(1280 * max(self.widen_factor, 1.0))
        x = CBL(out_ch, name="conv2", **kw)(x, train)
        return DeconvHead(
            self.num_joints, name="head", **kw
        )(x, train).astype(jnp.float32)
