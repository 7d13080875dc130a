"""Lite-HRNet: shuffle stem, multi-resolution stages with conditional channel
weighting, iterative head (NHWC).

Reference: models/pose_estimation/lite_hrnet.py:11-387. Depth 18/30 switch
selects num_modules (3,4,3)/(3,8,3). Quirk preserved: the reference's fuse
loop adds branch-0's contribution twice (lite_hrnet.py:196-201).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import (
    BatchNorm,
    Conv,
    adaptive_avg_pool,
    channel_shuffle,
    resize_nearest,
)


def resize_bilinear_align_corners(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize matching torch align_corners=True."""
    h, w = size
    B, H, W, C = x.shape
    if (H, W) == (h, w):
        return x
    scale = jnp.array(
        [(h - 1) / max(H - 1, 1), (w - 1) / max(W - 1, 1)], jnp.float32
    )
    # align_corners=True maps out i -> in i/scale; scale_and_translate's
    # half-pixel convention needs translate 0.5*(1 - scale) to cancel
    # (verified against F.interpolate to 7e-7)
    return jax.image.scale_and_translate(
        x, (B, h, w, C), (1, 2), scale, 0.5 * (1.0 - scale),
        method="bilinear",
    )


class HRDWConv(nn.Module):
    """Depthwise-separable conv with optional mid/last ReLUs
    (reference: lite_hrnet.py:11-27)."""

    features: int
    stride: int = 1
    mid_relu: bool = True
    last_relu: bool = True
    use_bias: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = Conv(
            C, 3, self.stride, 1, groups=C, use_bias=self.use_bias,
            dtype=self.dtype, name="dw",
        )(x)
        x = BatchNorm(name="dw_bn", **kw)(x, train)
        if self.mid_relu:
            x = jax.nn.relu(x)
        x = Conv(
            self.features, 1, use_bias=self.use_bias, dtype=self.dtype,
            name="pw",
        )(x)
        x = BatchNorm(name="pw_bn", **kw)(x, train)
        if self.last_relu:
            x = jax.nn.relu(x)
        return x


class SpatialWeighting(nn.Module):
    """SE-ish per-branch gate (reference: lite_hrnet.py:56-76); note the
    reference applies ReLU *then* sigmoid in both convs."""

    ratio: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        mid = int(C / self.ratio)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(mid, 1, dtype=self.dtype, name="c1")(s)
        s = jax.nn.sigmoid(jax.nn.relu(s))
        s = Conv(C, 1, dtype=self.dtype, name="c2")(s)
        s = jax.nn.sigmoid(jax.nn.relu(s))
        return x * s


class CrossResolutionWeighting(nn.Module):
    """Cross-branch SE over pooled multi-resolution maps
    (reference: lite_hrnet.py:78-111)."""

    channels: Sequence[int]
    ratio: int = 8
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        mini = xs[-1].shape[1:3]
        pooled = [adaptive_avg_pool(s, mini) for s in xs[:-1]] + [xs[-1]]
        out = jnp.concatenate(pooled, axis=-1)
        total = sum(self.channels)
        mid = int(total / self.ratio)
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        out = Conv(mid, 1, dtype=self.dtype, name="c1")(out)
        out = BatchNorm(name="bn1", **kw)(out, train)
        out = jax.nn.sigmoid(jax.nn.relu(out))
        out = Conv(total, 1, dtype=self.dtype, name="c2")(out)
        out = BatchNorm(name="bn2", **kw)(out, train)
        out = jax.nn.sigmoid(jax.nn.relu(out))
        splits = jnp.split(out, np_cumsum(self.channels)[:-1], axis=-1)
        return [
            s * resize_nearest(a, s.shape[1:3])
            for s, a in zip(xs, splits)
        ]


def np_cumsum(xs):
    out, acc = [], 0
    for x in xs:
        acc += x
        out.append(acc)
    return out


class ConditionalChannelWeighting(nn.Module):
    """Split-channel shuffle block (reference: lite_hrnet.py:113-143)."""

    in_channels: Sequence[int]
    reduce_ratio: int = 8
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        branch_channels = [c // 2 for c in self.in_channels]
        x1 = [s[..., : c // 2] for s, c in zip(xs, self.in_channels)]
        x2 = [s[..., c // 2:] for s, c in zip(xs, self.in_channels)]

        x2 = CrossResolutionWeighting(
            tuple(branch_channels), self.reduce_ratio,
            axis_name=self.axis_name, dtype=self.dtype, name="crw",
        )(x2, train)
        out2 = []
        for i, s in enumerate(x2):
            c = branch_channels[i]
            s = Conv(
                c, 3, 1, 1, groups=c, dtype=self.dtype, name=f"dw{i}"
            )(s)
            s = BatchNorm(self.axis_name, dtype=self.dtype, name=f"dw{i}_bn")(
                s, train
            )
            s = SpatialWeighting(4, dtype=self.dtype, name=f"sw{i}")(s, train)
            out2.append(s)
        return [
            channel_shuffle(jnp.concatenate([a, b], axis=-1), 2)
            for a, b in zip(x1, out2)
        ]


class StageModule(nn.Module):
    """num_blocks CCW blocks + cross-resolution fuse
    (reference: lite_hrnet.py:145-204)."""

    in_channels: Sequence[int]
    num_blocks: int = 2
    reduce_ratio: int = 8
    with_fuse: bool = True
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.in_channels)
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        for b in range(self.num_blocks):
            xs = ConditionalChannelWeighting(
                tuple(self.in_channels), self.reduce_ratio,
                name=f"ccw{b}", **kw,
            )(xs, train)
        if n == 1 or not self.with_fuse:
            return list(xs)

        def make_fuse(j_src, i_dst):
            """Build the (j_src -> i_dst) fuse path ONCE; returns a callable
            so it can be applied twice (module/param sharing)."""
            c_out = self.in_channels[i_dst]
            if j_src == i_dst:
                return lambda s: s
            if j_src > i_dst:  # upsample
                conv = Conv(
                    c_out, 1, use_bias=False, dtype=self.dtype,
                    name=f"fuse{i_dst}_{j_src}",
                )
                bn = BatchNorm(name=f"fuse{i_dst}_{j_src}_bn", **kw)

                def up(s):
                    s = bn(conv(s), train)
                    h, w = s.shape[1:3]
                    factor = 2 ** (j_src - i_dst)
                    return resize_nearest(s, (h * factor, w * factor))

                return up
            # downsample i_dst - j_src times
            downs = [
                HRDWConv(
                    c_out if k == i_dst - j_src - 1
                    else self.in_channels[j_src],
                    stride=2, mid_relu=False, last_relu=False,
                    name=f"fuse{i_dst}_{j_src}_{k}", **kw,
                )
                for k in range(i_dst - j_src)
            ]

            def down(s):
                for m in downs:
                    s = m(s, train)
                return s

            return down

        # reference quirk (lite_hrnet.py:194-202): `y = out[0]; y += ...`
        # MUTATES branch 0 in place, so (a) every row adds its branch-0 term
        # twice, and (b) rows i>=1 fuse the ACCUMULATED pre-relu branch-0 sum
        # s0, not the original branch-0 activation. In train mode the
        # fuse_layers[i][0] modules are genuinely CALLED twice per forward
        # (`y = fuse[i][0](out[0])` then `y += fuse[i][0](out[0])`), so
        # their BNs EMA the same batch stats twice per step — replicated by
        # a real double application (outputs identical; in eval, where no
        # stats move, a single call scaled by 2 is the same function).
        s0 = 2.0 * xs[0]
        for j in range(1, n):
            s0 = s0 + make_fuse(j, 0)(xs[j])
        out = [jax.nn.relu(s0)]
        for i in range(1, n):
            f0 = make_fuse(0, i)
            y = f0(s0) + f0(s0) if train else 2.0 * f0(s0)
            for j in range(1, n):
                y = y + (xs[j] if i == j else make_fuse(j, i)(xs[j]))
            out.append(jax.nn.relu(y))
        return out


class StemModule(nn.Module):
    """Shuffle stem (reference: lite_hrnet.py:206-248)."""

    stem_channels: int = 32
    out_channels: int = 32
    expand_ratio: int = 1
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = Conv(self.stem_channels, 3, 2, 1, dtype=self.dtype, name="c1")(x)
        x = BatchNorm(name="bn1", **kw)(x, train)
        x = jax.nn.relu(x)

        branch = self.stem_channels // 2
        mid = int(round(self.stem_channels * self.expand_ratio))
        same = self.stem_channels == self.out_channels
        inc = self.out_channels - (branch if same else self.stem_channels)
        x1, x2 = x[..., :branch], x[..., branch:]

        x1 = HRDWConv(
            inc, stride=2, mid_relu=False, use_bias=True, name="branch1", **kw
        )(x1, train)

        x2 = Conv(mid, 1, dtype=self.dtype, name="expand")(x2)
        x2 = BatchNorm(name="expand_bn", **kw)(x2, train)
        x2 = jax.nn.relu(x2)
        x2 = Conv(mid, 3, 2, 1, groups=mid, dtype=self.dtype, name="dw")(x2)
        x2 = BatchNorm(name="dw_bn", **kw)(x2, train)
        x2 = Conv(
            branch if same else self.stem_channels, 1, dtype=self.dtype,
            name="linear",
        )(x2)
        x2 = BatchNorm(name="linear_bn", **kw)(x2, train)
        x2 = jax.nn.relu(x2)
        return channel_shuffle(jnp.concatenate([x1, x2], axis=-1), 2)


class IterativeHead(nn.Module):
    """Top-down refinement (reference: lite_hrnet.py:250-280)."""

    in_channels: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        rev = list(xs[::-1])
        chans = list(self.in_channels[::-1])
        n = len(rev)
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        y, last = [], None
        for i, s in enumerate(rev):
            if last is not None:
                last = resize_bilinear_align_corners(last, s.shape[1:3])
                s = s + last
            out_c = chans[i + 1] if i != n - 1 else chans[i]
            s = HRDWConv(out_c, name=f"proj{i}", **kw)(s, train)
            y.append(s)
            last = s
        return y[::-1]


class LiteHRNet(nn.Module):
    """Reference: lite_hrnet.py:283-387."""

    num_joints: int = 21
    depth: int = 30
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy
        return cls(
            num_joints=cfg.MODEL.get("output_channel", cfg.DATASET.num_joints),
            depth=cfg.MODEL.get("depth", 30),
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        spec = dict(
            num_modules=(3, 4, 3) if self.depth == 18 else (3, 8, 3),
            num_branches=(2, 3, 4),
            num_blocks=(2, 2, 2),
            reduce_ratios=(8, 8, 8),
            num_channels=((40, 80), (40, 80, 160), (40, 80, 160, 320)),
        )
        x = StemModule(32, 32, 1, name="stem", **kw)(x, train)
        y_list = [x]
        prev_channels = [32]

        for i in range(3):
            cur_channels = list(spec["num_channels"][i])
            n_cur, n_prev = len(cur_channels), len(prev_channels)
            # transition (reference: lite_hrnet.py:325-347)
            x_list = []
            for j in range(n_cur):
                if j < n_prev:
                    if cur_channels[j] != prev_channels[j]:
                        s = HRDWConv(
                            cur_channels[j], mid_relu=False,
                            name=f"trans{i}_{j}", **kw,
                        )(y_list[j], train)
                    else:
                        s = y_list[j]
                else:
                    s = y_list[-1]
                    for k in range(j + 1 - n_prev):
                        out_c = (
                            cur_channels[j] if k == j - n_prev else s.shape[-1]
                        )
                        s = HRDWConv(
                            out_c, stride=2, mid_relu=False,
                            name=f"trans{i}_{j}_{k}", **kw,
                        )(s, train)
                x_list.append(s)
            for m in range(spec["num_modules"][i]):
                x_list = StageModule(
                    tuple(cur_channels), spec["num_blocks"][i],
                    spec["reduce_ratios"][i], name=f"stage{i}_{m}", **kw,
                )(x_list, train)
            y_list = x_list
            prev_channels = cur_channels

        y_list = IterativeHead(
            tuple(prev_channels), name="head", **kw
        )(y_list, train)
        out = Conv(self.num_joints, 1, dtype=self.dtype, name="out_conv")(
            y_list[0]
        )
        return out.astype(jnp.float32)
