"""Attention library (NHWC): SoftPool, stacked-stage channel attention,
SE/CBAM/SK/BAM/NAM gates.

Reference: models/attention.py:36-425. The reference stubbed out a CUDA
SoftPool binding (attention.py:7-33) and fell back to a two-avg-pool torch
version; here the same math is a single fused XLA expression (a Pallas
kernel is unnecessary — XLA fuses exp/mul/reduce_window into one pass).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import (
    BatchNorm, Conv, TorchBatchNorm, adaptive_avg_pool,
)


def soft_pool(x: jnp.ndarray, kernel: int = 2, stride: int = 2) -> jnp.ndarray:
    """SoftPool (exp-weighted average pooling), NHWC
    (reference: attention.py:36-55)."""
    window = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    x_exp = jnp.exp(x)
    num = jax.lax.reduce_window(
        x_exp * x, 0.0, jax.lax.add, window, strides, "VALID"
    )
    den = jax.lax.reduce_window(
        x_exp, 0.0, jax.lax.add, window, strides, "VALID"
    )
    return num / den


class SoftPooling(nn.Module):
    kernel: int = 2
    stride: int = 2

    def __call__(self, x):
        return soft_pool(x, self.kernel, self.stride)


class StageChannelAttention(nn.Module):
    """Cross-stack heatmap channel selection with LayerNorm
    (reference: attention.py:58-108). Input: list of [B, H, W, C] maps."""

    channels: int
    reduction: int = 4
    n_block: int = 2
    min_unit: int = 16

    @nn.compact
    def __call__(self, xs, train: bool = False):
        mid = max(self.channels // self.reduction, self.min_unit)
        vectors = []
        for i, block in enumerate(xs):
            g = jnp.mean(block, axis=(1, 2))  # [B, C]
            g = nn.LayerNorm(epsilon=1e-5, name=f"ln{i}")(g)
            g = nn.Dense(mid, use_bias=False, name=f"fc1_{i}")(g)
            g = jax.nn.relu(g)
            g = nn.Dense(self.channels, name=f"fc2_{i}")(g)
            vectors.append(jax.nn.sigmoid(g))
        att = jax.nn.softmax(jnp.stack(vectors, axis=1), axis=1)  # [B, n, C]
        out = 0.0
        for i, block in enumerate(xs):
            out = out + block * att[:, i][:, None, None, :]
        return out / self.n_block


class StageChannelAttentionAll(nn.Module):
    """Variant fusing all stacks' global features
    (reference: attention.py:111-172)."""

    channels: int
    reduction: int = 4
    n_block: int = 2
    min_unit: int = 12

    @nn.compact
    def __call__(self, xs, train: bool = False):
        mid = max(self.channels // self.reduction, self.min_unit)
        feats = []
        for i, block in enumerate(xs):
            g = jnp.mean(block, axis=(1, 2))
            g = nn.LayerNorm(epsilon=1e-5, name=f"ln{i}")(g)
            g = nn.Dense(mid, use_bias=False, name=f"fc1_{i}")(g)
            g = nn.Dropout(0.3, deterministic=not train)(g)
            g = jax.nn.relu(g)
            feats.append(g)
        fused = jnp.concatenate(feats, axis=-1)
        vectors = [
            nn.Dense(self.channels, name=f"fc2_{i}")(fused)
            for i in range(self.n_block)
        ]
        att = jax.nn.softmax(jnp.stack(vectors, axis=1), axis=1)
        out = 0.0
        for i, block in enumerate(xs):
            out = out + block * att[:, i][:, None, None, :]
        return out


class StageChannelAttentionFC(nn.Module):
    """Gram-matrix variant (reference: attention.py:175-213)."""

    channels: int
    n_block: int = 2

    @nn.compact
    def __call__(self, xs, train: bool = False):
        B = xs[0].shape[0]
        C = self.channels
        heatmaps = jnp.concatenate(xs, axis=-1)  # [B, H, W, C*n]
        g = adaptive_avg_pool(heatmaps, (2, 2))  # [B, 2, 2, C*n]
        g = jnp.transpose(g, (0, 3, 1, 2)).reshape(B, C * self.n_block, 4)
        gram = jnp.einsum("bcf,bdf->bcd", g, g)
        gsum = jnp.sum(gram, axis=2)  # [B, C*n]
        out = nn.LayerNorm(epsilon=1e-5, name="ln")(gsum)
        out = nn.Dropout(0.3, deterministic=not train)(out)
        out = nn.Dense(C * self.n_block, name="fc")(out)
        att = jax.nn.softmax(out.reshape(B, self.n_block, C), axis=1)
        stacked = jnp.stack(xs, axis=1)  # [B, n, H, W, C]
        return jnp.sum(stacked * att[:, :, None, None, :], axis=1)


class SELayer(nn.Module):
    """Classic SE (reference: attention.py:216-231)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(C // self.reduction, use_bias=False, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(C, use_bias=False, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class RegionChannelAttention(nn.Module):
    """CBAM channel gate: shared MLP over avg+max pools
    (reference: attention.py:234-250)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        mlp_1 = Conv(C // self.reduction, 1, use_bias=False, name="mlp1")
        mlp_2 = Conv(C, 1, use_bias=False, name="mlp2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = mlp_2(jax.nn.relu(mlp_1(avg))) + mlp_2(jax.nn.relu(mlp_1(mx)))
        return jax.nn.sigmoid(out)


class RegionSpatialAttention(nn.Module):
    """CBAM spatial gate (reference: attention.py:253-266)."""

    kernel: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = Conv(
            1, self.kernel, 1, (self.kernel - 1) // 2, use_bias=False,
            name="conv",
        )(s)
        return jax.nn.sigmoid(s)


class CBAM(nn.Module):
    """Conv block + channel & spatial gates + residual
    (reference: attention.py:269-294)."""

    features: int
    reduction: int = 16
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        out = Conv(self.features, 3, 1, 1, dtype=self.dtype, name="c1")(x)
        out = BatchNorm(name="bn1", **kw)(out, train)
        out = jax.nn.relu(out)
        out = Conv(self.features, 3, 1, 1, dtype=self.dtype, name="c2")(out)
        out = BatchNorm(name="bn2", **kw)(out, train)
        out = RegionChannelAttention(self.reduction, name="ca")(out, train) * out
        out = RegionSpatialAttention(name="sa")(out, train) * out
        out = out + Conv(self.features, 1, dtype=self.dtype, name="res")(x)
        return jax.nn.relu(out)


class SKConv(nn.Module):
    """Selective-kernel conv (reference: attention.py:297-341)."""

    channels: int
    groups: int = 1
    reduction: int = 16
    n_scale: int = 4
    stride: int = 1
    min_unit: int = 32
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = max(int(self.channels / self.reduction), self.min_unit)
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        feats = []
        for i in range(self.n_scale):
            k = 3 + i * 2
            f = Conv(
                self.channels, k, self.stride, 1 + i, groups=self.groups,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            f = BatchNorm(name=f"bn{i}", **kw)(f, train)
            feats.append(jax.nn.relu(f))
        stacked = jnp.stack(feats, axis=1)  # [B, n, H, W, C]
        u = jnp.sum(stacked, axis=1)
        s = jnp.mean(u, axis=(1, 2))  # [B, C]
        z = nn.Dense(d, name="fc")(s)
        vectors = [
            nn.Dense(self.channels, name=f"fcs{i}")(z)
            for i in range(self.n_scale)
        ]
        att = jax.nn.softmax(jnp.stack(vectors, axis=1), axis=1)
        return jnp.sum(stacked * att[:, :, None, None, :], axis=1)


class BAM(nn.Module):
    """Bottleneck attention module (reference: attention.py:350-397)."""

    reduction: int = 16
    dilation: int = 4
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        # channel gate
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(C // self.reduction, name="c_fc0")(g)
        g = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, name="c_bn0",
        )(g)
        g = jax.nn.relu(g)
        g = nn.Dense(C, name="c_fc_final")(g)
        channel = g[:, None, None, :]
        # spatial gate
        s = Conv(C // self.reduction, 1, dtype=self.dtype, name="s_reduce")(x)
        s = BatchNorm(name="s_bn0", **kw)(s, train)
        s = jax.nn.relu(s)
        for i in range(2):
            s = Conv(
                C // self.reduction, 3, 1, self.dilation,
                dilation=self.dilation, dtype=self.dtype, name=f"s_di{i}",
            )(s)
            s = BatchNorm(name=f"s_di{i}_bn", **kw)(s, train)
            s = jax.nn.relu(s)
        s = Conv(1, 1, dtype=self.dtype, name="s_final")(s)
        att = 1.0 + jax.nn.sigmoid(channel * s)
        return att * x


class NAMChannelAtt(nn.Module):
    """Normalization-based attention (reference: attention.py:399-416)."""

    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        bn = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, name="bn",
        )
        y = bn(x)
        gamma = self.get_variable("params", "bn")["scale"]
        # the reference reads bn.weight.DATA (attention.py:397-400): the
        # gate weights are constants in autograd, so gamma gets gradients
        # only through the BN normalization path
        gamma = jax.lax.stop_gradient(gamma)
        w = jnp.abs(gamma) / jnp.sum(jnp.abs(gamma))
        y = y * w
        return jax.nn.sigmoid(y) * residual
