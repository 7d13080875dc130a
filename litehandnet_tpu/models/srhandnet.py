"""SRHandNet: multi-dilation stem, 3 downsampling stages, 4 refine heads.

Reference: models/pose_estimation/SRHandNet/SRhandNet.py:41-144. Outputs a
4-tuple of [B, h_i, w_i, out_c] maps at 1/8, 1/8, 1/4, 1/2 of the stem
resolution (e.g. 22/22/44/88 for 176 input, 32/32/64/128 for 256);
out_c = 24 = 21 keypoints + 3-channel region map when pred_bbox.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import BatchNorm, Conv, resize_nearest


class SRStem(nn.Module):
    """3-dilation parallel stem (reference: SRhandNet.py:41-54)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [
            Conv(21, 3, 2, 1, dilation=1, dtype=self.dtype, name="c1")(x),
            Conv(21, 3, 2, 2, dilation=2, dtype=self.dtype, name="c2")(x),
            Conv(21, 3, 2, 5, dilation=5, dtype=self.dtype, name="c3")(x),
        ]
        return jax.nn.relu(jnp.concatenate(outs, axis=-1))


class SRBasicBlock(nn.Module):
    """3x3 pair + 1x1 skip (reference: SRhandNet.py:56-79)."""

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
            skip = Conv(self.features, 1, self.stride, 0, dtype=self.dtype, name="skip")(x)
        else:
            skip = x
        return jax.nn.relu(out + skip)


class SRHandNet(nn.Module):
    """Reference: SRhandNet.py:82-137.

    Default out_channels follows the reference's ``output_channel``
    default of 21 (SRhandNet.py:85) — the region-map configs set 24
    (21 kpts + center + w/h) explicitly."""

    out_channels: int = 21
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy
        return cls(
            out_channels=cfg.MODEL.get("output_channel", 21),
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = SRStem(dtype=self.dtype, name="stem")(x, train)
        b1 = SRBasicBlock(128, 2, name="b1a", **kw)(x, train)
        b1 = SRBasicBlock(128, name="b1b", **kw)(b1, train)
        b2 = SRBasicBlock(256, 2, name="b2a", **kw)(b1, train)
        b2 = SRBasicBlock(256, name="b2b", **kw)(b2, train)
        b3 = SRBasicBlock(512, 2, name="b3a", **kw)(b2, train)
        b3 = SRBasicBlock(512, name="b3b", **kw)(b3, train)

        def head(z, features, name):
            z = SRBasicBlock(features[0], name=f"{name}a", **kw)(z, train)
            z = SRBasicBlock(features[1], name=f"{name}b", **kw)(z, train)
            z = Conv(
                self.out_channels, 1, dtype=self.dtype, name=f"{name}out"
            )(z)
            return z

        out1 = head(b3, (256, 128), "h4")
        out2 = head(jnp.concatenate([b3, out1], axis=-1), (256, 128), "h5")
        h, w = out2.shape[1:3]
        out2_up = resize_nearest(out2, (h * 2, w * 2))
        out3 = head(jnp.concatenate([b2, out2_up], axis=-1), (256, 128), "h6")
        h, w = out3.shape[1:3]
        out3_up = resize_nearest(out3, (h * 2, w * 2))
        out4 = head(jnp.concatenate([b1, out3_up], axis=-1), (128, 128), "h7")
        f32 = jnp.float32
        return (
            out1.astype(f32), out2.astype(f32),
            out3.astype(f32), out4.astype(f32),
        )
