"""YOLOv6-style hand detector: EfficientRep backbone + RepPAN neck +
anchor-free decoupled head (NHWC).

Reference: models/object_detection/yolov6/{common.py, efficientrep.py,
reppan.py, effidehead.py, yolo.py} (vendored YOLOv6, feeding the hand-OD
branch; not wired into the reference's registry either). Rebuilt compactly
on the shared RepBlock machinery so the same functional fusion
(`models/reparam.fuse_params`) deploys it.

Outputs per image: [N_total, 5 + num_classes] rows (cx, cy, w, h, obj,
cls...) over the three strides (8, 16, 32), decoded anchor-free.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import (
    Conv,
    RepBlock,
    RepConv,
    relu,
    resize_nearest,
)


class SimSPPF(nn.Module):
    """Simplified SPPF (reference: common.py)."""

    features: int
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        mid = self.features // 2
        x = RepConv(mid, 1, act=relu, name="cv1", **kw)(x, train)

        def pool5(z):
            return nn.max_pool(
                z, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2))
            )

        y1 = pool5(x)
        y2 = pool5(y1)
        y3 = pool5(y2)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return RepConv(self.features, 1, act=relu, name="cv2", **kw)(out, train)


class RepStage(nn.Module):
    """Stack of RepBlocks (reference: common.py RepBlock n-stack)."""

    features: int
    n: int = 1
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        for i in range(self.n):
            x = RepBlock(self.features, 3, 1, 1, act=relu, name=f"b{i}", **kw)(
                x, train
            )
        return x


class EfficientRep(nn.Module):
    """Backbone (reference: efficientrep.py): stride-2 RepBlocks between
    RepStage stacks; returns features at strides 8, 16, 32."""

    channels: Sequence[int] = (16, 32, 64, 128, 256)
    num_repeats: Sequence[int] = (1, 2, 4, 6, 2)
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        c = self.channels
        x = RepBlock(c[0], 3, 2, 1, act=relu, name="stem", **kw)(x, train)
        outs = []
        for i in range(1, 5):
            x = RepBlock(c[i], 3, 2, 1, act=relu, name=f"down{i}", **kw)(x, train)
            x = RepStage(c[i], self.num_repeats[i], name=f"stage{i}", **kw)(x, train)
            if i == 4:
                x = SimSPPF(c[i], name="sppf", **kw)(x, train)
            if i >= 2:
                outs.append(x)
        return outs  # strides 8, 16, 32


class RepPANNeck(nn.Module):
    """PAN neck (reference: reppan.py)."""

    channels: Sequence[int] = (64, 128, 256)
    n: int = 3
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats  # strides 8, 16, 32
        ch = self.channels
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)

        def up(z):
            return resize_nearest(z, (z.shape[1] * 2, z.shape[2] * 2))

        p5 = RepConv(ch[1], 1, act=relu, name="reduce0", **kw)(c5, train)
        x = jnp.concatenate([up(p5), c4], axis=-1)
        x = RepStage(ch[1], self.n, name="csp0", **kw)(x, train)
        p4 = RepConv(ch[0], 1, act=relu, name="reduce1", **kw)(x, train)
        x = jnp.concatenate([up(p4), c3], axis=-1)
        out0 = RepStage(ch[0], self.n, name="csp1", **kw)(x, train)  # stride 8

        x = RepBlock(ch[0], 3, 2, 1, act=relu, name="down0", **kw)(out0, train)
        x = jnp.concatenate([x, p4], axis=-1)
        out1 = RepStage(ch[1], self.n, name="csp2", **kw)(x, train)  # stride 16

        x = RepBlock(ch[1], 3, 2, 1, act=relu, name="down1", **kw)(out1, train)
        x = jnp.concatenate([x, p5], axis=-1)
        out2 = RepStage(ch[2], self.n, name="csp3", **kw)(x, train)  # stride 32
        return [out0, out1, out2]


class EffiDeHead(nn.Module):
    """Anchor-free decoupled head (reference: effidehead.py): per-scale stem
    + separate cls/reg branches; decode to (cx, cy, w, h, obj, cls...)."""

    num_classes: int = 1
    strides: Sequence[int] = (8, 16, 32)
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        outs = []
        for i, (x, stride) in enumerate(zip(feats, self.strides)):
            C = x.shape[-1]
            s = RepConv(C, 1, act=relu, name=f"stem{i}", **kw)(x, train)
            cls = RepConv(C, 3, 1, 1, act=relu, name=f"cls_conv{i}", **kw)(s, train)
            cls = Conv(
                self.num_classes, 1, dtype=self.dtype, name=f"cls_pred{i}"
            )(cls)
            reg = RepConv(C, 3, 1, 1, act=relu, name=f"reg_conv{i}", **kw)(s, train)
            box = Conv(4, 1, dtype=self.dtype, name=f"reg_pred{i}")(reg)
            obj = Conv(1, 1, dtype=self.dtype, name=f"obj_pred{i}")(reg)

            B, H, W, _ = box.shape
            gy, gx = jnp.mgrid[0:H, 0:W]
            grid = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)
            cxcy = (box[..., :2] + grid) * stride
            wh = jnp.exp(jnp.clip(box[..., 2:4], -10, 8)) * stride
            row = jnp.concatenate(
                [
                    cxcy, wh,
                    jax.nn.sigmoid(obj), jax.nn.sigmoid(cls),
                ],
                axis=-1,
            )
            outs.append(row.reshape(B, H * W, 5 + self.num_classes))
        return jnp.concatenate(outs, axis=1).astype(jnp.float32)


class YOLOv6(nn.Module):
    """Full detector (reference: yolo.py build_model)."""

    num_classes: int = 1
    width: float = 0.25
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        m = cfg.MODEL
        return cls(
            num_classes=m.get("num_classes", 1),
            width=m.get("width_multiple", 0.25),
            deploy=deploy,
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        def w(c):
            return max(int(c * self.width / 0.25), 8)

        kw = dict(deploy=self.deploy, axis_name=self.axis_name, dtype=self.dtype)
        feats = EfficientRep(
            channels=tuple(w(c) for c in (16, 32, 64, 128, 256)),
            name="backbone", **kw,
        )(x, train)
        feats = RepPANNeck(
            channels=tuple(w(c) for c in (64, 128, 256)), name="neck", **kw
        )(feats, train)
        return EffiDeHead(
            self.num_classes, name="head", **kw
        )(feats, train)
