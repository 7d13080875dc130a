"""Fused batch-norm statistics kernels (Pallas, TPU).

Train-mode BatchNorm was measured at ~16% of the litehandnet train step
(PROFILE.md §train): the shipped two-pass variance reads the 51 MB
activation twice on top of the conv's own write. Two kernels cut those
bytes:

* :func:`moments` — per-channel (mean, biased var) in ONE read. Each
  grid block computes an exact two-pass mean/M2 entirely in VMEM (no
  HBM re-read), blocks combine with Chan's parallel update in f32
  scratch accumulators, so the numerics match the honest two-pass
  (the naive one-pass E[x^2]-E[x]^2 cancellation that round 2 rejected
  never appears). Backward is the analytic closed form.

* :func:`dw_conv3x3_stats` — depthwise 3x3 conv AND its output moments
  in one pass: y never makes a round trip to HBM before its statistics
  exist. This is the "conv + stat epilogue" for the depthwise RepConvs
  that dominate litehandnet's train graph (models/layers.py RepConv with
  groups=C; reference repblocks.py:23-73). Backward delegates to
  ``jax.vjp`` over the reference jnp implementation (same math XLA
  differentiates today).

Both fall back to plain jnp off-TPU or for shapes the kernels don't
cover; callers A/B through ``tools/benchmark.py --train``.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at trace time
        return False


# ---------------------------------------------------------------------------
# moments: one-read per-channel mean/var
# ---------------------------------------------------------------------------


def _moments_kernel(x_ref, mean_ref, var_ref, acc_ref, n_total_f):
    """Grid step: exact two-pass stats of this block in VMEM, Chan-combined
    into acc_ref = [3, C] f32 rows (count, mean, M2)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:].astype(jnp.float32)          # [bm, C]
    n_b = jnp.float32(xb.shape[0])
    bm = jnp.sum(xb, axis=0) / n_b             # block mean   [C]
    bM2 = jnp.sum(jnp.square(xb - bm), axis=0)  # block M2     [C]

    n_a = acc_ref[0, :]
    mean_a = acc_ref[1, :]
    M2_a = acc_ref[2, :]
    tot = n_a + n_b
    delta = bm - mean_a
    acc_ref[0, :] = tot
    acc_ref[1, :] = mean_a + delta * (n_b / tot)
    acc_ref[2, :] = M2_a + bM2 + jnp.square(delta) * (n_a * n_b / tot)

    @pl.when(i == pl.num_programs(0) - 1)
    def _finish():
        mean_ref[0, :] = acc_ref[1, :]
        var_ref[0, :] = acc_ref[2, :] / n_total_f


def _pallas_moments(x2: jnp.ndarray, block_rows: int) -> Tuple[jnp.ndarray,
                                                               jnp.ndarray]:
    M, C = x2.shape
    grid = M // block_rows  # caller guarantees divisibility
    kernel = functools.partial(_moments_kernel, n_total_f=float(M))
    mean, var = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((3, C), jnp.float32)],
    )(x2)
    return mean[0], var[0]


def _moments_block_rows(M: int, C: int, dtype) -> int:
    """Largest divisor of M that keeps the block within ~2 MB of VMEM and
    respects the dtype's sublane tile; 0 if none works."""
    itemsize = jnp.dtype(dtype).itemsize
    sublane = {2: 16, 4: 8, 1: 32}.get(itemsize, 8)
    cap = max((2 * 1024 * 1024) // max(C * itemsize, 1), sublane)
    best = 0
    b = sublane
    while b <= cap:
        if M % b == 0:
            best = b
        b *= 2
    return best


def _moments_ref(x: jnp.ndarray):
    xf = x.astype(jnp.float32)
    red = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=red)
    var = jnp.mean(jnp.square(xf - mean), axis=red)
    return mean, var


@jax.custom_vjp
def moments(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel (mean, biased variance) over all leading axes of an
    NHWC-style tensor, one HBM read on TPU, two-pass-exact numerics.

    For C < 128 with 128 % C == 0 the tensor is viewed as [M/R, 128]
    (R = 128/C): lane j then always holds channel j % C, so the kernel's
    per-lane stats are R exact partials per channel, Chan-combined in
    f32 afterwards — full lane utilization instead of padding."""
    C = x.shape[-1]
    M = int(np.prod(x.shape[:-1]))
    # dispatch on the platform the computation actually LOWERS to (not the
    # process default backend): a CPU-targeted trace inside a TPU process
    # (jax.default_device(cpu), CPU shardings, golden checks) must get the
    # jnp fallback, not a Mosaic kernel it cannot lower
    if C % 128 == 0:
        block_rows = _moments_block_rows(M, C, x.dtype)
        if block_rows == 0:
            return _moments_ref(x)
        return jax.lax.platform_dependent(
            x,
            tpu=lambda v: _pallas_moments(v.reshape(M, C), block_rows),
            default=_moments_ref,
        )
    if (128 % C == 0 and (M * C) % 128 == 0
            and os.environ.get("LHN_FUSED_BN_SMALLC", "0") == "1"):
        # measured a net train-step REGRESSION despite full lane use
        # (PROFILE.md §train-r4): the custom-vjp boundary cost exceeds
        # the saved read at these sites; kept opt-in for re-measurement
        R = 128 // C
        Mr = M * C // 128
        block_rows = _moments_block_rows(Mr, 128, x.dtype)
        if block_rows == 0:
            return _moments_ref(x)

        def _smallc(v):
            m128, v128 = _pallas_moments(v.reshape(Mr, 128), block_rows)
            means = m128.reshape(R, C)  # R equal-count partials per channel
            varis = v128.reshape(R, C)
            mean = jnp.mean(means, axis=0)
            var = jnp.mean(varis + jnp.square(means - mean), axis=0)
            return mean, var

        return jax.lax.platform_dependent(x, tpu=_smallc,
                                          default=_moments_ref)
    return _moments_ref(x)


def _moments_fwd(x):
    mean, var = moments(x)
    return (mean, var), (x, mean)


def _moments_bwd(res, g):
    x, mean = res
    gmean, gvar = g
    n = float(np.prod(x.shape[:-1]))
    # d mean / dx_i = 1/n;  d var / dx_i = 2 (x_i - mean) / n
    dx = gmean / n + gvar * (2.0 / n) * (x.astype(jnp.float32) - mean)
    return (dx.astype(x.dtype),)


moments.defvjp(_moments_fwd, _moments_bwd)


# ---------------------------------------------------------------------------
# depthwise 3x3 conv + output moments, one pass
# ---------------------------------------------------------------------------


def _dw_ref(x: jnp.ndarray, w: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Reference depthwise 3x3 'SAME' conv, NHWC, stride 1. w: [3, 3, C]."""
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, C).astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def _dw_stats_kernel(x_ref, w_ref, y_ref, mean_ref, var_ref, acc_ref,
                     *, dilation: int, n_total_f: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)            # [H, W, C]
    w = w_ref[:].astype(jnp.float32)            # [3, 3, C]
    H, W, C = x.shape
    d = dilation
    acc = jnp.zeros((H, W, C), jnp.float32)
    # 9 shifted MACs; 'SAME' padding expressed as static pad-to-full adds
    # (scatter-style .at[].add lowers to a captured-constant gather that
    # Mosaic rejects; pad+add is pure concat/add)
    for ky in range(3):
        for kx in range(3):
            oy, ox = (ky - 1) * d, (kx - 1) * d
            ys0, ys1 = max(0, -oy), min(H, H - oy)
            xs0, xs1 = max(0, -ox), min(W, W - ox)
            patch = x[ys0 + oy:ys1 + oy, xs0 + ox:xs1 + ox, :]
            acc = acc + jnp.pad(
                w[ky, kx] * patch,
                ((ys0, H - ys1), (xs0, W - xs1), (0, 0)),
            )
    y_ref[0] = acc.astype(y_ref.dtype)

    n_b = jnp.float32(H * W)
    bm = jnp.sum(acc, axis=(0, 1)) / n_b
    bM2 = jnp.sum(jnp.square(acc - bm), axis=(0, 1))
    n_a = acc_ref[0, :]
    mean_a = acc_ref[1, :]
    M2_a = acc_ref[2, :]
    tot = n_a + n_b
    delta = bm - mean_a
    acc_ref[0, :] = tot
    acc_ref[1, :] = mean_a + delta * (n_b / tot)
    acc_ref[2, :] = M2_a + bM2 + jnp.square(delta) * (n_a * n_b / tot)

    @pl.when(i == pl.num_programs(0) - 1)
    def _finish():
        mean_ref[0, :] = acc_ref[1, :]
        var_ref[0, :] = acc_ref[2, :] / n_total_f


def _pallas_dw_stats(x, w, dilation):
    N, H, W, C = x.shape
    kernel = functools.partial(
        _dw_stats_kernel, dilation=dilation, n_total_f=float(N * H * W))
    y, mean, var = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((3, C), jnp.float32)],
    )(x, w)
    return y, mean[0], var[0]


def dw_conv3x3_stats_supported(x_shape, dtype, dilation: int = 1) -> bool:
    N, H, W, C = x_shape
    itemsize = jnp.dtype(dtype).itemsize
    vmem_need = H * W * C * (itemsize + 4 + 4)  # x + f32 acc + f32 y staging
    # C 32/64 run lane-padded (DW conv is VPU-elementwise with headroom;
    # the win is the removed HBM stat passes, which scale with bytes)
    return (_on_tpu() and C % 32 == 0 and W % 8 == 0
            and vmem_need < 8 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv3x3_stats(x: jnp.ndarray, w: jnp.ndarray, dilation: int = 1):
    """Depthwise 3x3 'SAME' stride-1 conv + per-channel output moments in
    one fused pass. x: [N,H,W,C], w: [3,3,C] -> (y, mean[C], var[C])."""

    def _ref(x, w):
        y = _dw_ref(x, w, dilation)
        mean, var = _moments_ref(y)
        return y, mean, var

    if not dw_conv3x3_stats_supported(x.shape, x.dtype, dilation):
        return _ref(x, w)
    # per-lowering-platform dispatch (see moments): CPU-targeted traces in
    # a TPU process take the jnp path instead of an unlowerable kernel
    return jax.lax.platform_dependent(
        x, w,
        tpu=lambda x, w: _pallas_dw_stats(x, w, dilation),
        default=_ref,
    )


def _dw_fwd(x, w, dilation):
    y, mean, var = dw_conv3x3_stats(x, w, dilation)
    return (y, mean, var), (x, w)


def _dw_bwd(dilation, res, g):
    x, w = res

    def ref(x, w):
        y = _dw_ref(x, w, dilation)
        mean, var = _moments_ref(y)
        return y, mean, var

    _, vjp = jax.vjp(ref, x, w)
    return vjp(g)


dw_conv3x3_stats.defvjp(_dw_fwd, _dw_bwd)
