"""Hourglass ablation model: mynet with switchable attention.

Reference: models/hourglass_ablation.py:110-311 — MSRB (ME_att) on/off,
residual channel attention (rca), and ca_type in
{ca, se, 1x1, identity, cbam}.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.attention import CBAM
from litehandnet_tpu.models.layers import (
    BatchNorm,
    Conv,
    adaptive_avg_pool,
    leaky_relu,
    resize_nearest,
)
from litehandnet_tpu.models.ms_att_hourglass import (
    BRC,
    PeleeStem,
    PlainBasicBlock,
    PlainBottleNeck,
    PlainDWConv,
)


class RCAGate(nn.Module):
    """3x3-pooled BN/ReLU/depthwise + Linear sigmoid gate
    (reference: hourglass_ablation.py:73-82, also ME_att's 'ca')."""

    features: int
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        att = adaptive_avg_pool(x, (3, 3))
        att = BatchNorm(self.axis_name, dtype=self.dtype, name="bn")(att, train)
        att = jax.nn.relu(att)
        att = Conv(
            self.features, 3, 1, 0, groups=self.features, dtype=self.dtype,
            name="conv",
        )(att)
        att = att.reshape(att.shape[0], -1)
        att = nn.Dropout(0.3, deterministic=not train)(att)
        att = nn.Dense(self.features, name="fc")(att)
        return x * jax.nn.sigmoid(att)[:, None, None, :]


class AblationResidual(nn.Module):
    """Residual with optional channel attention
    (reference: hourglass_ablation.py:66-90)."""

    features: int
    stride: int = 1
    num_block: int = 2
    rca: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = PlainBasicBlock(self.features, self.stride, name="c1", **kw)(x, train)
        for i in range(self.num_block):
            x = PlainBottleNeck(name=f"b{i}", **kw)(x, train)
        if self.rca:
            x = RCAGate(self.features, name="att", **kw)(x, train)
        return x


class AblationMEAtt(nn.Module):
    """ME_att with switchable gate (reference: hourglass_ablation.py:160-234)."""

    features: int
    ca_type: str = "ca"
    reduction: int = 16
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

        ca = self.ca_type.lower()
        if ca == "ca":
            out = RCAGate(self.features, name="att", **kw)(out, train)
        elif ca == "se":
            g = jnp.mean(out, axis=(1, 2))
            g = nn.Dense(
                self.features // self.reduction, use_bias=False, name="att_fc1"
            )(g)
            g = jax.nn.relu(g)
            g = nn.Dense(self.features, use_bias=False, name="att_fc2")(g)
            out = out * jax.nn.sigmoid(g)[:, None, None, :]
        elif ca == "1x1":
            out = Conv(self.features, 1, dtype=self.dtype, name="att")(out)
        elif ca == "identity":
            pass
        elif ca == "cbam":
            out = CBAM(self.features, name="att", **kw)(out, train)
        else:
            raise ValueError(f"ca_type {self.ca_type!r}")
        return out


class HourglassAblation(nn.Module):
    """Reference: hourglass_ablation.py:272-303."""

    num_joints: int = 21
    num_stage: int = 4
    features: int = 128
    num_blocks: Sequence[int] = (2, 2, 2)
    msrb: bool = True
    rca: bool = False
    ca_type: str = "ca"
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
            msrb=m.get("msrb", True),
            rca=m.get("rca", False),
            ca_type=m.get("ca_type", "ca"),
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = PeleeStem(self.features, name="pre", **kw)(imgs, train)

        # encoder/decoder (reference: hourglass_ablation.py:110-157)
        out_encoder = []
        if self.msrb:
            assert len(self.num_blocks) == self.num_stage - 1
            x = AblationMEAtt(
                self.features, self.ca_type, name="enc0", **kw
            )(x, train)
            out_encoder.append(x)
            for i in range(self.num_stage - 1):
                x = AblationResidual(
                    self.features, 2, self.num_blocks[i], self.rca,
                    name=f"enc{i + 1}", **kw,
                )(x, train)
                out_encoder.append(x)
        else:
            assert len(self.num_blocks) == self.num_stage
            x = AblationResidual(
                self.features, 1, self.num_blocks[0], self.rca,
                name="enc0", **kw,
            )(x, train)
            out_encoder.append(x)
            for i in range(self.num_stage - 1):
                x = AblationResidual(
                    self.features, 2, self.num_blocks[i + 1], self.rca,
                    name=f"enc{i + 1}", **kw,
                )(x, train)
                out_encoder.append(x)

        h, w = out_encoder[-1].shape[1:3]
        shortcut = adaptive_avg_pool(out_encoder[0], (h, w))

        for i in range(self.num_stage):
            counterpart = out_encoder[self.num_stage - 1 - i]
            if i < self.num_stage - 1:
                layer = AblationResidual(
                    self.features, 1, 2, self.rca, name=f"dec{i}", **kw
                )
            elif self.msrb:
                layer = AblationMEAtt(
                    self.features, self.ca_type, name=f"dec{i}", **kw
                )
            else:
                layer = AblationResidual(
                    self.features, 1, 2, self.rca, name=f"dec{i}", **kw
                )
            if i == 0:
                x = layer(counterpart, train) + shortcut
            else:
                x = layer(x, train)
                ch, cw = counterpart.shape[1:3]
                x = resize_nearest(x, (ch, cw)) + counterpart

        f = PlainBottleNeck(name="feat_b", **kw)(x, train)
        f = Conv(self.features, 1, dtype=self.dtype, name="feat_c")(f)
        f = BatchNorm(self.axis_name, dtype=self.dtype, name="feat_bn")(f, train)
        f = leaky_relu(f)
        preds = Conv(self.num_joints, 1, dtype=self.dtype, name="outs")(f)
        return preds.astype(jnp.float32)
