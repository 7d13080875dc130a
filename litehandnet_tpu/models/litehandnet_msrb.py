"""LiteHandNet MSRB variant — the alternative flagship with split-channel
dual-dilation rep branches and ShuffleNet-style units.

Reference: models/pose_estimation/liteHandNet/litehourglass.py:13-237 (MSRB,
RepBasicUnit, DWConv_ELAN, maxpool encoder/decoder) and repblocks.py:239-295
(shuffle units). All convs are RepConvs, so the same functional fusion
(`models/reparam.fuse_params`) produces the deploy graph.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import (
    Activation,
    relu,
    ChannelAttention,
    Conv,
    RepConv,
    SEBlock,
    adaptive_avg_pool,
    channel_shuffle,
    max_pool2,
    resize_nearest,
)


def _ca(ca_type, features, deploy, axis_name, dtype, name):
    if ca_type == "se":
        return SEBlock(max(features // 16, 1), dtype=dtype, name=name)
    if ca_type == "ca":
        return ChannelAttention(
            deploy=deploy, axis_name=axis_name, dtype=dtype, name=name
        )
    return None


class MSRB(nn.Module):
    """Split-channel dual-dilation rep block (reference: litehourglass.py:13-50):
    two rounds of {plain-DW | dilated-DW} over channel halves with a channel
    attention on the residual, then a 1x1 RepConv."""

    features: int
    ca_type: str = "none"
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        half = in_c // 2
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        out = x
        for i in range(2):
            left, right = out[..., :half], out[..., half:]
            left = RepConv(
                half, 3, 1, 1, groups=half, act=None, name=f"b1_{i}", **kw
            )(left, train)
            right = RepConv(
                half, 3, 1, 2, dilation=2, groups=half, act=None,
                name=f"b2_{i}", **kw,
            )(right, train)
            merged = jnp.concatenate([left, right], axis=-1)
            ca = _ca(self.ca_type, in_c, self.deploy, self.axis_name,
                     self.dtype, f"ca_{i}")
            if ca is not None:
                merged = ca(merged, train)
            out = out + merged
        return RepConv(self.features, 1, 1, 0, act=relu, name="proj", **kw)(out + x, train)  # default act -> effective ReLU (repblocks.py:30)


class RepBasicUnit(nn.Module):
    """ShuffleNetV2-style split unit with channel attention
    (reference: litehourglass.py:52-79, repblocks.py:239-272)."""

    features: int
    ca_type: str = "ca"
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        left_part = in_c // 2
        right_out = self.features - left_part
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        left = x[..., :left_part]
        right = x[..., left_part:]
        right = RepConv(right_out, 1, act=relu, name="c1", **kw)(right, train)  # effective ReLU
        right = RepConv(
            right_out, 3, 1, 1, groups=right_out, act=relu, name="c2", **kw
        )(right, train)
        out = jnp.concatenate([left, right], axis=-1)
        ca = _ca(self.ca_type, self.features, self.deploy, self.axis_name,
                 self.dtype, "ca")
        if ca is not None:
            out = ca(out, train)
        return out


class RepDownsampleUnit(nn.Module):
    """ShuffleNetV2 downsample unit (reference: repblocks.py:274-295).

    Default activation is ReLU like the reference (its ``activation=nn.ReLU``
    default is instantiated positionally as ``nn.ReLU(inplace=True)`` —
    exact ReLU, see the RepConv quirk in PARITY.md)."""

    act: Activation = relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        r = RepConv(C, 1, 1, 0, act=self.act, name="r1", **kw)(x, train)
        r = RepConv(C, 3, 2, 1, groups=C, act=None, name="r2", **kw)(r, train)
        r = RepConv(C, 1, 1, 0, act=self.act, name="r3", **kw)(r, train)
        l = RepConv(C, 3, 2, 1, groups=C, act=None, name="l1", **kw)(x, train)
        l = RepConv(C, 1, 1, 0, act=self.act, name="l2", **kw)(l, train)
        return channel_shuffle(jnp.concatenate([r, l], axis=-1), 2)


class DWConvELAN(nn.Module):
    """ELAN-style rep block (reference: litehourglass.py:81-106)."""

    features: int
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)

        def chain(z, name):
            z = RepConv(mid, 3, 1, 1, groups=mid, act=None, name=f"{name}a", **kw)(z, train)
            z = RepConv(mid, 1, act=relu, name=f"{name}b", **kw)(z, train)
            z = RepConv(mid, 3, 1, 1, groups=mid, act=None, name=f"{name}c", **kw)(z, train)
            z = RepConv(mid, 1, act=relu, name=f"{name}d", **kw)(z, train)
            return z

        out1 = chain(x[..., :mid], "c1")
        out2 = chain(out1, "c2")
        out = Conv(
            self.features, 1, dtype=self.dtype, name="proj"
        )(jnp.concatenate([x, out1, out2], axis=-1))
        return channel_shuffle(out, 2)


class LiteHandNetMSRB(nn.Module):
    """Alternative LiteHandNet (reference: litehourglass.py:196-237)."""

    num_joints: int = 21
    num_stage: int = 4
    features: int = 128
    msrb_ca: str = "ca"
    rbu_ca: str = "ca"
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        m = cfg.MODEL
        return cls(
            num_joints=m.get("output_channel", cfg.DATASET.num_joints),
            num_stage=m.get("num_stage", 4),
            features=m.get("input_channel", 256),  # reference default, litehourglass.py:202
            msrb_ca=m.get("msrb_ca", "ca"),
            rbu_ca=m.get("rbu_ca", "ca"),
            deploy=deploy,
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.features
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        mid = max(C // 4, 32)

        # stem (reference: litehourglass.py:166-190)
        x = RepConv(mid, 3, 2, 1, act=relu, name="stem_c1", **kw)(x, train)  # effective ReLU
        x = RepConv(mid, 3, 1, 1, groups=mid, act=relu, name="stem_c2", **kw)(x, train)
        b1 = RepConv(mid, 1, act=relu, name="stem_b1a", **kw)(x, train)
        b1 = RepConv(mid, 3, 2, 1, groups=mid, act=None, name="stem_b1b", **kw)(b1, train)
        b1 = RepConv(mid, 1, act=relu, name="stem_b1c", **kw)(b1, train)
        b2 = max_pool2(x)
        x = RepConv(C, 1, act=relu, name="stem_proj", **kw)(
            jnp.concatenate([b1, b2], axis=-1), train
        )
        x = RepBasicUnit(C, "ca", name="stem_u1", **kw)(x, train)  # stem RBUs hardcode ca (litehourglass.py:182-186)
        x = RepBasicUnit(C, "ca", name="stem_u2", **kw)(x, train)

        # maxpool encoder / interpolate decoder (reference :108-163)
        def stage(z, i, prefix):
            if i == 0:
                z = MSRB(C, self.msrb_ca, name=f"{prefix}{i}_msrb", **kw)(z, train)
                z = RepBasicUnit(C, self.rbu_ca, name=f"{prefix}{i}_rbu", **kw)(z, train)
            else:
                z = RepBasicUnit(C, self.rbu_ca, name=f"{prefix}{i}_a", **kw)(z, train)
                z = RepBasicUnit(C, self.rbu_ca, name=f"{prefix}{i}_b", **kw)(z, train)
            return z

        out_encoder = []
        for i in range(self.num_stage):
            x = stage(x, i, "enc")
            out_encoder.append(x)
            if i != self.num_stage - 1:
                x = max_pool2(x)

        for i in range(self.num_stage - 1, -1, -1):
            counterpart = out_encoder[i]
            if i == self.num_stage - 1:
                x = stage(counterpart, i, "dec")
                h, w = out_encoder[-1].shape[1:3]
                x = x + adaptive_avg_pool(out_encoder[0], (h, w))
            else:
                x = resize_nearest(x, counterpart.shape[1:3]) + counterpart
                x = stage(x, i, "dec")

        x = RepBasicUnit(C, "ca", name="neck1", **kw)(x, train)
        x = RepBasicUnit(C, "ca", name="neck2", **kw)(x, train)
        out = Conv(self.num_joints, 1, dtype=self.dtype, name="head")(x)
        return out.astype(jnp.float32)
