"""AttHandNet ("Attention! A Lightweight 2D Hand Pose Estimation Approach"),
NHWC — DenseNet-style ARB blocks with attention-augmented convolutions,
BlurPool anti-aliased downsampling, Mish activations, and direct [B, 21, 2]
coordinate regression.

Reference: models/pose_estimation/AttentionHandNet/{__init__.py,
attention_augmentation2D.py, blur.py, mish.py}.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from litehandnet_tpu.models.layers import BatchNorm, Conv


def mish(x):
    """Mish activation (reference: mish.py:7-12)."""
    return x * jnp.tanh(jax.nn.softplus(x))


_BINOMIAL = {
    1: [1.0],
    2: [1.0, 1.0],
    3: [1.0, 2.0, 1.0],
    4: [1.0, 3.0, 3.0, 1.0],
    5: [1.0, 4.0, 6.0, 4.0, 1.0],
}


def blur_pool(x: jnp.ndarray, filt_size: int = 3, stride: int = 2) -> jnp.ndarray:
    """Anti-aliased downsampling (reference: blur.py:13-53): reflect pad +
    binomial depthwise conv, stride 2."""
    a = np.asarray(_BINOMIAL[filt_size], np.float32)
    filt = a[:, None] * a[None, :]
    filt = filt / filt.sum()
    C = x.shape[-1]
    pad = (filt_size - 1) // 2
    pad_hi = -(-(filt_size - 1) // 2)
    x = jnp.pad(
        x, ((0, 0), (pad, pad_hi), (pad, pad_hi), (0, 0)), mode="reflect"
    )
    k = jnp.tile(jnp.asarray(filt, x.dtype)[:, :, None, None], (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "VALID", dimension_numbers=dn,
        feature_group_count=C,
    )


def _rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """[B, Nh, L, 2L-1] relative logits -> [B, Nh, L, L] absolute
    (reference: attention_augmentation2D.py:128-140)."""
    B, Nh, L, _ = x.shape
    x = jnp.concatenate([x, jnp.zeros((B, Nh, L, 1), x.dtype)], axis=3)
    flat = x.reshape(B, Nh, L * 2 * L)
    flat = jnp.concatenate([flat, jnp.zeros((B, Nh, L - 1), x.dtype)], axis=2)
    final = flat.reshape(B, Nh, L + 1, 2 * L - 1)
    return final[:, :, :L, L - 1:]


class AugmentedConv(nn.Module):
    """Attention-augmented convolution
    (reference: attention_augmentation2D.py:10-140): a conv producing
    out_channels - dv features concatenated with dv features from 2D
    multi-head self-attention with relative position logits.
    """

    out_channels: int
    kernel: int
    dk_ratio: float = 0.1
    dv_ratio: float = 0.1
    num_heads: int = 4
    relative: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dk = int(self.dk_ratio * self.out_channels)
        dv = int(self.dv_ratio * self.out_channels)
        Nh = self.num_heads
        assert dk % Nh == 0 and dv % Nh == 0, (dk, dv, Nh)
        pad = (self.kernel - 1) // 2

        if self.kernel % 2 == 0:
            xc = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        else:
            xc = x
        conv_out = Conv(
            self.out_channels - dv, self.kernel, 1, pad, dtype=self.dtype,
            name="conv_out",
        )(xc)
        B, H, W, _ = conv_out.shape

        qkv = Conv(2 * dk + dv, 1, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, [dk, 2 * dk], axis=-1)
        dkh = dk // Nh

        def heads(t, d):  # [B, H, W, d] -> [B, Nh, H, W, d/Nh]
            return jnp.transpose(
                t.reshape(B, H, W, Nh, d // Nh), (0, 3, 1, 2, 4)
            )

        q = heads(q, dk) * (dkh ** -0.5)
        k = heads(k, dk)
        v = heads(v, dv)

        logits = jnp.einsum(
            "bnxyd,bnuvd->bnxyuv", q, k
        ).reshape(B, Nh, H * W, H * W)

        if self.relative:
            key_rel_w = self.param(
                "key_rel_w", nn.initializers.normal(1.0), (2 * W - 1, dkh)
            )
            key_rel_h = self.param(
                "key_rel_h", nn.initializers.normal(1.0), (2 * H - 1, dkh)
            )
            # width-relative
            rel_w = jnp.einsum("bnxyd,md->bnxym", q, key_rel_w)
            rel_w = _rel_to_abs(rel_w.reshape(B, Nh * H, W, 2 * W - 1))
            rel_w = rel_w.reshape(B, Nh, H, W, W)[:, :, :, None, :, :]
            rel_w = jnp.broadcast_to(rel_w, (B, Nh, H, H, W, W))
            rel_w = jnp.transpose(rel_w, (0, 1, 2, 4, 3, 5))  # [B,Nh,H,W,H,W]
            logits = logits + rel_w.reshape(B, Nh, H * W, H * W)
            # height-relative (transpose x/y)
            qt = jnp.transpose(q, (0, 1, 3, 2, 4))  # [B, Nh, W, H, dkh]
            rel_h = jnp.einsum("bnxyd,md->bnxym", qt, key_rel_h)
            rel_h = _rel_to_abs(rel_h.reshape(B, Nh * W, H, 2 * H - 1))
            rel_h = rel_h.reshape(B, Nh, W, H, H)[:, :, :, None, :, :]
            rel_h = jnp.broadcast_to(rel_h, (B, Nh, W, W, H, H))
            # [B,Nh,W,W,H,H] -> [B,Nh,H,W,H,W]
            rel_h = jnp.transpose(rel_h, (0, 1, 4, 2, 5, 3))
            logits = logits + rel_h.reshape(B, Nh, H * W, H * W)

        weights = jax.nn.softmax(logits, axis=-1)
        # flat_v must match torch's channels-first flattening: v is
        # (B, Nh, dvh, H, W) flattened over (H, W), i.e. [B, Nh, dvh, HW]
        flat_v = jnp.transpose(v, (0, 1, 4, 2, 3)).reshape(
            B, Nh, dv // Nh, H * W
        )
        attn = jnp.einsum("bnqk,bndk->bnqd", weights, flat_v)
        # reference QUIRK (attention_augmentation2D.py:70): the [B, Nh, HW,
        # dvh] result is reshaped STRAIGHT to (B, Nh, dvh, H, W) — a raw
        # row-major memory reinterpretation, not a transpose. Replicated
        # bit-for-bit; trained reference checkpoints bake it in.
        attn = attn.reshape(B, Nh * (dv // Nh), H, W).reshape(B, dv, H, W)
        attn = jnp.transpose(attn, (0, 2, 3, 1))
        attn = Conv(dv, 1, dtype=self.dtype, name="attn_out")(attn)
        return jnp.concatenate([conv_out, attn], axis=-1)


class AugBlock(nn.Module):
    """AugmentedConv + BN + Mish (reference: __init__.py:36-43)."""

    out_channels: int
    kernel: int
    num_heads: int = 4
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = AugmentedConv(
            self.out_channels, self.kernel, num_heads=self.num_heads,
            dtype=self.dtype, name="aug",
        )(x)
        x = BatchNorm(self.axis_name, dtype=self.dtype, name="norm")(x, train)
        return mish(x)


class ARBAdd(nn.Module):
    """Attention-augmented residual block, additive merge
    (reference: __init__.py:46-76)."""

    out_channels: int
    kernel: int
    aug: bool = True
    num_heads: int = 4
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels * 4
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        if self.kernel % 2 == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        h = Conv(mid, 1, dtype=self.dtype, name="pw")(x)
        h = BatchNorm(name="pw_bn", **kw)(h, train)
        h = mish(h)
        h = Conv(
            mid, self.kernel, 1, (self.kernel - 1) // 2, groups=mid,
            dtype=self.dtype, name="dw",
        )(h)
        h = BatchNorm(name="dw_bn", **kw)(h, train)
        h = mish(h)
        if self.aug:
            a = AugBlock(
                mid, self.kernel, self.num_heads, name="att", **kw
            )(h, train)
            h = a + h
        out = Conv(self.out_channels, 1, dtype=self.dtype, name="proj")(h)
        out = BatchNorm(name="proj_bn", **kw)(out, train)
        return mish(out)


class DenseBlock(nn.Module):
    """Dense connectivity over ARB blocks (reference: __init__.py:141-160)."""

    growth_rate: int
    kernel: int
    iteration: int
    num_heads: int = 4
    aug: bool = True
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [x]
        cur = x
        for i in range(self.iteration):
            y = ARBAdd(
                self.growth_rate, self.kernel, self.aug, self.num_heads,
                axis_name=self.axis_name, dtype=self.dtype, name=f"arb{i}",
            )(cur, train)
            # ARB preserves spatial size for every kernel (an even kernel's
            # +1 pad is exactly consumed by its pad-0 even-kernel depthwise
            # conv — same as the reference ARB_Add), so the dense concat
            # shapes always agree
            assert y.shape[1:3] == outs[0].shape[1:3], (y.shape, outs[0].shape)
            outs.append(y)
            cur = jnp.concatenate(outs, axis=-1)
        return cur


class Transition(nn.Module):
    """1x1 conv + BlurPool + BN (reference: __init__.py:163-174)."""

    out_channels: int
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.out_channels, 1, dtype=self.dtype, name="conv")(x)
        x = blur_pool(x)
        return BatchNorm(self.axis_name, dtype=self.dtype, name="norm")(x, train)


class AttHandNet(nn.Module):
    """light_Model (reference: __init__.py:177-237). Output: [B, 21, 2]
    normalized coordinates in [0, 1] (values clamped above at 1)."""

    num_joints: int = 21
    axis_name: Optional[str] = None
    dtype: Any = None

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy
        return cls(
            num_joints=cfg.MODEL.get("output_channel", 42) // 2,
            axis_name=axis_name,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        stages = [
            # (growth, kernel, iter, heads, aug, transition_out)
            (10, 5, 8, 4, False, 64),
            (10, 5, 8, 4, False, 64),
            (10, 3, 6, 1, True, 64),
            (10, 3, 8, 4, True, 64),
            (10, 3, 10, 4, True, 64),
            (10, 3, 12, 4, True, 128),
            (10, 3, 14, 4, True, 128),
        ]
        for i, (g, k, it, nh, aug, t_out) in enumerate(stages):
            x = DenseBlock(
                g, k, it, nh, aug, name=f"dense{i + 1}", **kw
            )(x, train)
            x = Transition(t_out, name=f"transition{i + 1}", **kw)(x, train)
        x = DenseBlock(10, 2, 32, 4, True, name="dense8", **kw)(x, train)
        x = AugBlock(100, 2, num_heads=10, name="aug_final", **kw)(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = Conv(self.num_joints * 2, 1, dtype=self.dtype, name="head")(x)
        x = jax.nn.relu(x)
        x = jnp.minimum(x, 1.0)
        B = x.shape[0]
        return x.reshape(B, self.num_joints, 2).astype(jnp.float32)
