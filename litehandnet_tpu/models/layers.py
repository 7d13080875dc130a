"""Shared NHWC building blocks: re-parameterizable convolutions and
channel-attention units.

TPU-first re-design of the reference's RepVGG-style blocks
(models/pose_estimation/liteHandNet/repblocks.py, common.py): channels-last
Flax modules whose training graph (multi-branch conv+BN) and deployment graph
(single fused conv) are two *module configurations* over params related by the
pure transform in `litehandnet_tpu.models.reparam` — re-parameterization is a
params->params function, not in-place module surgery.

Conventions:
* layouts are NHWC; conv kernels are HWIO;
* torch-style explicit padding (pad (p, p) both sides, floor output) so
  spatial sizes match the reference exactly;
* BatchNorm: eps 1e-5, momentum 0.9, optional `axis_name` for cross-device
  (SyncBN-equivalent) batch stats under shard_map.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Activation = Optional[Callable[[jnp.ndarray], jnp.ndarray]]

leaky_relu = jax.nn.leaky_relu  # slope 0.01, matches torch default
relu = jax.nn.relu
silu = jax.nn.silu


def get_activation(name: str | None) -> Activation:
    if name is None:
        return None
    name = name.lower()
    return {
        "leakyrelu": leaky_relu,
        "leaky_relu": leaky_relu,
        "relu": relu,
        "silu": silu,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "sigmoid": jax.nn.sigmoid,
        "none": None,
        "identity": None,
    }[name]


def _pair(v) -> tuple:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def repconv_act(act: Activation, inplace: bool) -> Activation:
    """EFFECTIVE activation of a reference RepConv.

    The reference instantiates ``activation(inplace)`` POSITIONALLY
    (repblocks.py:29-30), so for the default LeakyReLU the bool lands in
    ``negative_slope``: inplace=True -> slope 1.0 (identity), inplace=False ->
    slope 0.0 (exact ReLU). ReLU/SiLU take ``inplace`` as their first arg, so
    they behave normally. RepBlock passes inplace by keyword (repblocks.py:91)
    and is unaffected. Replicated faithfully: trained reference checkpoints
    (and forward parity) depend on the effective function, not the intended
    one.
    """
    if act is leaky_relu:
        return None if inplace else relu
    return act


class Conv(nn.Module):
    """Plain conv with torch-style integer padding (NHWC / HWIO)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel)
        p = _pair(self.padding)
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=((p[0], p[0]), (p[1], p[1])),
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class _ParamHolder(nn.Module):
    """Declares `kernel` exactly where nn.Conv would, for fused paths that
    consume the kernel directly instead of through nn.Conv."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class _NestedKernel(nn.Module):
    """<name>/conv/kernel — the param path `Conv` produces (layers.Conv
    wraps nn.Conv under child name 'conv'), so checkpoints/torch-import
    see an identical tree whichever path executes."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return _ParamHolder(self.shape, name="conv")()


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's running-stat convention.

    Differs from flax ``nn.BatchNorm`` in exactly one place: the running
    variance EMAs the UNBIASED batch variance (x n/(n-1)), matching
    ``torch.nn.BatchNorm2d`` — flax EMAs the biased one. Normalization in
    train mode still uses the biased variance (both frameworks agree
    there), so only eval-mode outputs after training see the difference
    (<=n/(n-1), the "known accepted deviation" this module deletes from
    PARITY.md). Variable collections/names match nn.BatchNorm
    (params: scale, bias; batch_stats: mean, var) so checkpoints and
    torch-import rules are unchanged. ``axis_name`` gives SyncBN semantics:
    stats (and the unbiased n) are computed over the global batch.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, precomputed=None):
        C = x.shape[-1]
        red = tuple(range(x.ndim - 1))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (C,),
            jnp.float32,
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (C,),
            jnp.float32,
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif precomputed is not None:
            # stats computed in the producing conv's epilogue
            # (ops/fused_bn.dw_conv3x3_stats); EMA semantics unchanged
            assert self.axis_name is None, "precomputed stats are per-device"
            mean, var = precomputed
            n = x.size // C
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        else:
            xf = x.astype(jnp.float32)
            n = x.size // C
            sync = self.axis_name is not None and not self.is_initializing()
            if not sync:
                if use_fused_bn_stats():
                    # ONE-read Pallas moments: per-block exact two-pass in
                    # VMEM + Chan combine — same numerics as the two-pass
                    # below (the naive one-pass E[x^2]-E[x]^2 cancels
                    # catastrophically at |mean| >> std and stays banned),
                    # half the stat-pass HBM traffic (ops/fused_bn.py)
                    from litehandnet_tpu.ops.fused_bn import moments

                    mean, var = moments(x)
                else:
                    # TWO-PASS variance E[(x-mean)^2], torch numerics. The
                    # round-2 "shifted one-pass" was SLOWER than this on
                    # v5e — XLA materializes the f32 shifted intermediate
                    # instead of re-fusing the subtract into both
                    # reductions. See PROFILE.md "BN-statistics cost".
                    mean = jnp.mean(xf, axis=red)
                    var = jnp.mean(jnp.square(xf - mean), axis=red)
            else:
                # SyncBN: per-device shifts don't compose across pmean, so
                # keep the plain two-pass (the collective dominates anyway)
                mean = jax.lax.pmean(jnp.mean(xf, axis=red), self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
                var = jax.lax.pmean(
                    jnp.mean(jnp.square(xf - mean), axis=red), self.axis_name
                )
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        # normalization arithmetic identical to flax nn.BatchNorm's
        # _normalize (same op order => bit-identical forward)
        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        y = x.astype(dtype) - mean.astype(dtype)
        mul = jax.lax.rsqrt(var.astype(dtype) + jnp.asarray(
            self.epsilon, dtype)) * scale.astype(dtype)
        return y * mul + bias.astype(dtype)


def use_fused_bn_stats() -> bool:
    """Pallas one-read BN statistics (LHN_FUSED_BN=0 opts out).

    Applied only at C%128==0 sites, where it is a measured pure win
    (b64: 33.7->32.8 ms, b128: 53.7->53.0 ms / 2,384->2,416 img/s).
    At C=64/32 sites the same kernel LOSES in-graph despite winning
    isolated — the custom-vjp boundary blocks XLA's conv-epilogue
    fusion, which computes BN stats nearly free (isolated DW conv
    0.88 ms vs conv+stats 0.95 ms) — so those sites need
    LHN_FUSED_BN_SMALLC=1 (and the fused DW conv LHN_FUSED_DW=1) to
    re-measure. See PROFILE.md §train-r4."""
    import os

    return os.environ.get("LHN_FUSED_BN", "1") != "0"


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults; axis_name enables SyncBN."""

    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, precomputed=None):
        return TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="bn",
        )(x, precomputed=precomputed if train else None)


class RepConv(nn.Module):
    """Conv+BN that fuses to a single biased conv at deploy time
    (reference: repblocks.py:23-73).

    Train graph: conv(no bias) -> BN -> act. Deploy graph: conv(bias) -> act.
    `reparam.fuse_params` maps train params+stats to deploy params.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    act: Activation = leaky_relu
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            out = Conv(
                self.features, self.kernel, self.stride, self.padding,
                self.dilation, self.groups, use_bias=True, dtype=self.dtype,
                name="rep",
            )(x)
        elif train and self._dw_fusable(x):
            # depthwise 3x3 in train mode: conv + BN statistics fused into
            # one Pallas pass (ops/fused_bn.dw_conv3x3_stats) — the stats
            # never re-read the conv output from HBM. Param tree identical
            # to the Conv path (main/conv/kernel), so checkpoints and
            # torch-import rules are unchanged.
            from litehandnet_tpu.ops.fused_bn import dw_conv3x3_stats

            C = x.shape[-1]
            kernel = _NestedKernel((3, 3, 1, C), name="main")()
            y, mean, var = dw_conv3x3_stats(
                x, kernel[:, :, 0, :], self.dilation)
            out = BatchNorm(self.axis_name, dtype=self.dtype, name="main_bn")(
                y, train, precomputed=(mean, var)
            )
        else:
            out = Conv(
                self.features, self.kernel, self.stride, self.padding,
                self.dilation, self.groups, use_bias=False, dtype=self.dtype,
                name="main",
            )(x)
            out = BatchNorm(self.axis_name, dtype=self.dtype, name="main_bn")(
                out, train
            )
        if self.act is not None:
            out = self.act(out)
        return out

    def _dw_fusable(self, x) -> bool:
        import os

        from litehandnet_tpu.ops.fused_bn import dw_conv3x3_stats_supported

        if os.environ.get("LHN_FUSED_DW", "0") != "1":
            return False
        C = x.shape[-1]
        return (
            use_fused_bn_stats()
            and self.axis_name is None
            and self.groups == C and self.features == C
            and self.kernel == 3 and self.stride == 1
            and self.padding == self.dilation  # 'SAME' for k=3
            and not self.is_initializing()
            and dw_conv3x3_stats_supported(x.shape, x.dtype, self.dilation)
        )


class RepBlock(nn.Module):
    """RepVGG block: kxk + 1x1 + identity-BN branches, fused at deploy
    (reference: repblocks.py:76-236).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    act: Activation = leaky_relu
    identity: bool = True
    deploy: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        if self.deploy:
            out = Conv(
                self.features, self.kernel, self.stride, self.padding,
                self.dilation, self.groups, use_bias=True, dtype=self.dtype,
                name="rep",
            )(x)
        else:
            dense = Conv(
                self.features, self.kernel, self.stride, self.padding,
                self.dilation, self.groups, use_bias=False, dtype=self.dtype,
                name="dense",
            )(x)
            dense = BatchNorm(self.axis_name, dtype=self.dtype, name="dense_bn")(
                dense, train
            )
            one = Conv(
                self.features, 1, self.stride, 0, 1, self.groups,
                use_bias=False, dtype=self.dtype, name="one",
            )(x)
            one = BatchNorm(self.axis_name, dtype=self.dtype, name="one_bn")(
                one, train
            )
            out = dense + one
            if self.identity and in_features == self.features and self.stride == 1:
                out = out + BatchNorm(
                    self.axis_name, dtype=self.dtype, name="id_bn"
                )(x, train)
        if self.act is not None:
            out = self.act(out)
        return out


def adaptive_avg_pool(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """torch-style adaptive average pooling over NHWC spatial dims.

    Region i spans [floor(i*S/O), ceil((i+1)*S/O)) — identical to
    torch.nn.functional.adaptive_avg_pool2d.
    """
    oh, ow = _pair(output_size)
    B, H, W, C = x.shape
    if (oh, ow) == (1, 1):
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if H % oh == 0 and W % ow == 0:
        x = x.reshape(B, oh, H // oh, ow, W // ow, C)
        return x.mean(axis=(2, 4))
    rows = []
    for i in range(oh):
        y0, y1 = (i * H) // oh, -(-((i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            x0, x1 = (j * W) // ow, -(-((j + 1) * W) // ow)
            cols.append(x[:, y0:y1, x0:x1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """ShuffleNet channel shuffle, NHWC (reference: common.py:6-20)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, groups, C // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(B, H, W, C)


class SEBlock(nn.Module):
    """Squeeze-and-excitation gate (reference: common.py:23-37)."""

    internal: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(self.internal, 1, use_bias=True, dtype=self.dtype, name="down")(s)
        s = jax.nn.relu(s)
        s = Conv(C, 1, use_bias=True, dtype=self.dtype, name="up")(s)
        return x * jax.nn.sigmoid(s)


class ChannelAttention(nn.Module):
    """3x3-pooled depthwise gate with re-parameterizable conv+BN
    (reference: common.py:40-90). Deploy fuses `att`+`att_bn` into `att_rep`.
    """

    deploy: bool = False
    dropout: float = 0.3
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        y = adaptive_avg_pool(x, (3, 3))
        if self.deploy:
            att = Conv(
                C, 3, 1, 0, groups=C, use_bias=True, dtype=self.dtype,
                name="att_rep",
            )(y)
        else:
            att = Conv(
                C, 3, 1, 0, groups=C, use_bias=False, dtype=self.dtype,
                name="att",
            )(y)
            att = BatchNorm(self.axis_name, dtype=self.dtype, name="att_bn")(
                att, train
            )
        # channel dropout (torch Dropout2d) then bottleneck MLP gate
        att = nn.Dropout(
            rate=self.dropout, broadcast_dims=(1, 2), deterministic=not train
        )(att)
        att = Conv(C // 2, 1, use_bias=True, dtype=self.dtype, name="fc_down")(att)
        att = leaky_relu(att)
        att = Conv(C, 1, use_bias=True, dtype=self.dtype, name="fc_up")(att)
        return x * jax.nn.sigmoid(att)


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC to (h, w); matches torch
    F.interpolate(mode='nearest') for integer up-scaling.

    Integer upscales are done as broadcast+reshape (pixel repeat): on TPU,
    jax.image.resize's gather lowers to a serialized while-loop +
    dynamic-update-slice that measured ~18% of the LiteHandNet deploy
    forward; the broadcast form is a plain vectorized copy."""
    h, w = size
    B, H, W, C = x.shape
    if h % H == 0 and w % W == 0:
        fy, fx = h // H, w // W
        if fy == 1 and fx == 1:
            return x
        out = jnp.broadcast_to(
            x[:, :, None, :, None, :], (B, H, fy, W, fx, C)
        )
        return out.reshape(B, h, w, C)
    return jax.image.resize(x, (B, h, w, C), method="nearest")


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool (ceil mode, NHWC)."""
    H, W = x.shape[1:3]
    pad = ((0, H % 2), (0, W % 2))
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding=pad)
