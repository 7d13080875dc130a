"""YOLOv6 hand detector: EfficientRep backbone + Rep-PAN neck + anchor-free
efficient decoupled head (NHWC).

Reference: models/object_detection/yolov6/{common.py, efficientrep.py,
reppan.py, effidehead.py, yolo.py} — the vendored YOLOv6 feeding the hand-OD
branch (dead code reference-side: nothing registers it). Rebuilt
structurally 1:1 so trained torch weights transfer exactly
(utils/torch_import.py rules "yolov6", tests/test_forward_parity.py):

* reference ``RepVGGBlock`` (common.py:135-258)   -> shared ``RepBlock``
  (3x3 + 1x1 + identity-BN branches, ReLU), fusable at deploy;
* reference ``RepBlock`` n-stack (common.py:119-132) -> ``RepStage``
  (``conv1`` + ``blk{k}``, mirroring conv1/block.k naming);
* reference ``SimConv``/``Conv`` (common.py:19-64)   -> ``RepConv`` with
  ReLU/SiLU (conv+BN+act, fused to conv+act at deploy);
* reference ``Transpose`` upsample (common.py:85-98) -> ``nn.ConvTranspose``
  2x2 stride 2 with bias. ``upsample='nearest'`` swaps in the TPU-friendly
  broadcast-reshape pixel repeat (no weights; breaks weight transfer for
  the neck upsamplers only — a deliberate serving-side variant).

Channel/depth scaling follows yolo.py:57-71: ``make_divisible(c * width, 8)``
over backbone+neck channel lists, ``max(round(n * depth), 1)`` over repeats.

Head output (effidehead.py:57-88, anchor-free na=1): train mode returns the
raw per-scale maps ``[B, ny, nx, 5 + nc]`` (channel order reg4, obj, cls);
eval mode decodes to ``[B, N_total, 5 + nc]`` rows
(cx, cy, w, h, obj, cls...) with (xy + grid) * stride, exp(wh) * stride and
sigmoid-ed obj/cls, concatenated over strides 8/16/32.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import (
    RepBlock,
    RepConv,
    relu,
    resize_nearest,
    silu,
)

# yolo.py defaults for the n-scale model (configs/yolov6n.py upstream):
# backbone/neck channel and repeat bases before width/depth scaling
_BACKBONE_CHANNELS = (64, 128, 256, 512, 1024)
_BACKBONE_REPEATS = (1, 6, 12, 18, 6)
_NECK_CHANNELS = (256, 128, 128, 256, 256, 512)
_NECK_REPEATS = (12, 12, 12, 12)


def make_divisible(x: float, divisor: int = 8) -> int:
    """yolo.py:57-59."""
    return int(math.ceil(x / divisor) * divisor)


def scaled_channels(width: float) -> tuple:
    """channels_list = backbone + neck lists, width-scaled (yolo.py:71)."""
    return tuple(
        make_divisible(c * width, 8)
        for c in _BACKBONE_CHANNELS + _NECK_CHANNELS
    )


def scaled_repeats(depth: float) -> tuple:
    """num_repeat, depth-scaled (yolo.py:70)."""
    return tuple(
        (max(round(n * depth), 1) if n > 1 else n)
        for n in _BACKBONE_REPEATS + _NECK_REPEATS
    )


class RepStage(nn.Module):
    """Reference RepBlock n-stack (common.py:119-132): ``conv1`` then n-1
    ``block.{k}`` RepVGG blocks."""

    features: int
    n: int = 1
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name,
                  dtype=self.dtype)
        x = RepBlock(self.features, 3, 1, 1, act=relu, name="conv1", **kw)(
            x, train
        )
        for k in range(self.n - 1):
            x = RepBlock(
                self.features, 3, 1, 1, act=relu, name=f"blk{k}", **kw
            )(x, train)
        return x


class SimSPPF(nn.Module):
    """Simplified SPPF (common.py:67-82): 1x1 reduce, 3 chained 5x5 max
    pools, concat, 1x1 expand; ReLU convs."""

    features: int
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name,
                  dtype=self.dtype)
        mid = x.shape[-1] // 2
        x = RepConv(mid, 1, act=relu, name="cv1", **kw)(x, train)

        def pool5(z):
            return nn.max_pool(
                z, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2))
            )

        y1 = pool5(x)
        y2 = pool5(y1)
        out = jnp.concatenate([x, y1, y2, pool5(y2)], axis=-1)
        return RepConv(self.features, 1, act=relu, name="cv2", **kw)(out, train)


class EfficientRep(nn.Module):
    """Backbone (efficientrep.py:5-102): RepVGG stem + 4 ERBlocks
    (stride-2 RepVGG + RepStage, SimSPPF closing ERBlock_5); returns
    features at strides 8, 16, 32."""

    channels: Sequence[int]       # channels_list[0:5]
    repeats: Sequence[int]        # num_repeat[0:5]
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name,
                  dtype=self.dtype)
        c, r = self.channels, self.repeats
        x = RepBlock(c[0], 3, 2, 1, act=relu, name="stem", **kw)(x, train)
        outs = []
        for i in (2, 3, 4, 5):
            x = RepBlock(
                c[i - 1], 3, 2, 1, act=relu, name=f"er{i}_down", **kw
            )(x, train)
            x = RepStage(
                c[i - 1], r[i - 1], name=f"er{i}_stage", **kw
            )(x, train)
            if i == 5:
                x = SimSPPF(c[4], name="sppf", **kw)(x, train)
            if i >= 3:
                outs.append(x)
        return outs  # strides 8, 16, 32


class RepPANNeck(nn.Module):
    """PAN neck (reppan.py:6-108): SimConv reduce/downsample layers,
    learnable ConvTranspose upsamplers (common.py:85-98), RepStage fusion
    stacks. ``upsample='nearest'`` replaces the transposed convs with the
    weightless pixel-repeat (TPU serving variant; not weight-transferable)."""

    channels: Sequence[int]       # full channels_list[0:11]
    repeats: Sequence[int]        # full num_repeat[0:9]
    upsample: str = "deconv"
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x2, x1, x0 = feats  # strides 8, 16, 32
        c, r = self.channels, self.repeats
        kw = dict(deploy=self.deploy, axis_name=self.axis_name,
                  dtype=self.dtype)

        def up(z, features, name):
            if self.upsample == "nearest":
                return resize_nearest(z, (z.shape[1] * 2, z.shape[2] * 2))
            return nn.ConvTranspose(
                features, (2, 2), strides=(2, 2), padding="VALID",
                use_bias=True, dtype=self.dtype, name=name,
            )(z)

        fpn_out0 = RepConv(c[5], 1, act=relu, name="reduce0", **kw)(x0, train)
        x = jnp.concatenate([up(fpn_out0, c[5], "up0"), x1], axis=-1)
        f_out0 = RepStage(c[5], r[5], name="p4", **kw)(x, train)

        fpn_out1 = RepConv(c[6], 1, act=relu, name="reduce1", **kw)(
            f_out0, train
        )
        x = jnp.concatenate([up(fpn_out1, c[6], "up1"), x2], axis=-1)
        pan_out2 = RepStage(c[6], r[6], name="p3", **kw)(x, train)  # stride 8

        x = RepConv(c[7], 3, 2, 1, act=relu, name="down2", **kw)(
            pan_out2, train
        )
        x = jnp.concatenate([x, fpn_out1], axis=-1)
        pan_out1 = RepStage(c[8], r[7], name="n3", **kw)(x, train)  # stride 16

        x = RepConv(c[9], 3, 2, 1, act=relu, name="down1", **kw)(
            pan_out1, train
        )
        x = jnp.concatenate([x, fpn_out0], axis=-1)
        pan_out0 = RepStage(c[10], r[8], name="n4", **kw)(x, train)  # stride 32
        return [pan_out2, pan_out1, pan_out0]


class Detect(nn.Module):
    """Efficient decoupled head (effidehead.py:7-88, anchor-free na=1):
    per scale a 1x1 SiLU stem, 3x3 SiLU cls/reg towers, 1x1 biased preds.
    cls/obj pred biases init to -log((1-p)/p), p=0.01
    (initialize_biases, effidehead.py:47-55)."""

    num_classes: int = 1
    strides: Sequence[int] = (8, 16, 32)
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        kw = dict(deploy=self.deploy, axis_name=self.axis_name,
                  dtype=self.dtype)
        prior_bias = nn.initializers.constant(
            -math.log((1 - 1e-2) / 1e-2)
        )
        raw, rows = [], []
        for i, (x, stride) in enumerate(zip(feats, self.strides)):
            C = x.shape[-1]
            s = RepConv(C, 1, act=silu, name=f"stem{i}", **kw)(x, train)
            cls = RepConv(C, 3, 1, 1, act=silu, name=f"cls_conv{i}", **kw)(
                s, train
            )
            cls = nn.Conv(
                self.num_classes, (1, 1), use_bias=True,
                bias_init=prior_bias, dtype=self.dtype, name=f"cls_pred{i}",
            )(cls)
            reg = RepConv(C, 3, 1, 1, act=silu, name=f"reg_conv{i}", **kw)(
                s, train
            )
            box = nn.Conv(
                4, (1, 1), use_bias=True, dtype=self.dtype,
                name=f"reg_pred{i}",
            )(reg)
            obj = nn.Conv(
                1, (1, 1), use_bias=True, bias_init=prior_bias,
                dtype=self.dtype, name=f"obj_pred{i}",
            )(reg)

            if train:
                # raw maps, channel order reg/obj/cls (effidehead.py:69-71)
                raw.append(jnp.concatenate([box, obj, cls], axis=-1))
                continue
            B, H, W, _ = box.shape
            gy, gx = jnp.mgrid[0:H, 0:W]
            grid = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)
            cxcy = (box[..., :2] + grid) * stride
            # exp clipped for jit-safety on untrained weights; the clip is
            # inactive in the reference's operating range (|wh| < 8)
            wh = jnp.exp(jnp.clip(box[..., 2:4], -30, 30)) * stride
            row = jnp.concatenate(
                [cxcy, wh, jax.nn.sigmoid(obj), jax.nn.sigmoid(cls)],
                axis=-1,
            )
            rows.append(row.reshape(B, H * W, 5 + self.num_classes))
        if train:
            return raw
        return jnp.concatenate(rows, axis=1).astype(jnp.float32)


class YOLOv6(nn.Module):
    """Full detector (yolo.py:11-93)."""

    num_classes: int = 1
    width: float = 0.25
    depth: float = 0.33
    upsample: str = "deconv"
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        m = cfg.MODEL
        return cls(
            num_classes=m.get("num_classes", 1),
            width=m.get("width_multiple", 0.25),
            depth=m.get("depth_multiple", 0.33),
            upsample=m.get("upsample", "deconv"),
            deploy=deploy,
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = scaled_channels(self.width)
        r = scaled_repeats(self.depth)
        kw = dict(deploy=self.deploy, axis_name=self.axis_name,
                  dtype=self.dtype)
        feats = EfficientRep(
            channels=c[:5], repeats=r[:5], name="backbone", **kw
        )(x, train)
        feats = RepPANNeck(
            channels=c, repeats=r, upsample=self.upsample, name="neck", **kw
        )(feats, train)
        return Detect(self.num_classes, name="head", **kw)(feats, train)
