"""Pallas TPU kernels for hot post-processing ops.

Two kernels:

* ``softpool_2x2`` — exp-weighted 2x2 pooling. The reference author stubbed
  a CUDA SoftPool binding and fell back to two average pools
  (models/attention.py:7-55); this is the real fused kernel on TPU: one VMEM
  pass computes exp, both weighted sums, and the quotient.
* ``blur_log`` — the DARK modulation step (11x11 separable Gaussian with
  zero borders, per-map max-rescale, log clamp; reference
  top_down_eval.py:233-272 + :435-436) fused into a single VMEM-resident
  kernel per batch element: the XLA version materializes pad -> convH ->
  convW -> rescale -> log through HBM.

Both run in interpret mode off-TPU, so the CPU test suite covers them; set
``interpret=None`` (default) to auto-detect.

Measured on v5e (batch 128): XLA's auto-fused versions are FASTER than these
hand kernels (softpool 51 ms vs 76 ms; blur+log 54 ms vs 90 ms) — XLA already
fuses the elementwise chains and tiles the convolutions well, while the
hand kernels pay for per-(batch, joint) grid granularity and lane padding.
They are kept as validated reference kernels (and the SoftPool the reference
author only stubbed in CUDA); the production paths
(litehandnet_tpu.ops.blur / models.attention.soft_pool) stay on XLA, per the
TPU playbook: don't hand-schedule what the compiler already does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from litehandnet_tpu.ops.blur import cv2_gaussian_kernel


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _softpool_kernel(x_ref, o_ref):
    # Mosaic supports strided loads from refs (not strided value slices):
    # load the four 2x2 phases and fuse exp/mul/sum/divide in registers.
    num = 0.0
    den = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            phase = x_ref[0, dy::2, dx::2, :]
            e = jnp.exp(phase)
            num = num + e * phase
            den = den + e
    o_ref[0] = num / den


def softpool_2x2(x: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """SoftPool kernel over [B, H, W, C] (H, W even). Matches
    litehandnet_tpu.models.attention.soft_pool(kernel=2, stride=2)."""
    if interpret is None:
        interpret = not _on_tpu()
    B, H, W, C = x.shape
    return pl.pallas_call(
        _softpool_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H // 2, W // 2, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _blur_log_kernel(x_ref, mv_ref, mh_ref, o_ref):
    """One (batch, joint) map per program: blur = mv @ x @ mh as two 2D MXU
    matmuls (Mosaic supports neither 2Dx3D dot_general, lane-dim dynamic
    slices, nor sublane-offset partial stores — probed on v5e), then the
    max-preserving rescale + log clamp in registers."""
    x = x_ref[0, 0]  # [H, W]
    orig_max = jnp.max(x)
    t = jnp.dot(mv_ref[:], x, preferred_element_type=jnp.float32)
    out = jnp.dot(t, mh_ref[:], preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    out = out * (orig_max / jnp.maximum(jnp.max(out), 1e-20))
    o_ref[0, 0] = jnp.log(jnp.maximum(out, 1e-10))


def _toeplitz(n: int, taps, pad: int):
    m = np.zeros((n, n), np.float32)
    for v in range(n):
        for t in range(len(taps)):
            w = v + t - pad
            if 0 <= w < n:
                m[w, v] = taps[t]
    return m


def blur_log(heatmaps: jnp.ndarray, kernel: int = 11,
             interpret=None) -> jnp.ndarray:
    """Fused DARK modulation: Gaussian blur (zero border, cv2-exact kernel)
    + max-preserving rescale + log in one VMEM-resident kernel per batch
    element. Equivalent to
    ``log(max(gaussian_blur(x, kernel, 'constant', preserve_max=True), 1e-10))``.
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, H, W, K = heatmaps.shape
    pad = (kernel - 1) // 2
    taps = cv2_gaussian_kernel(kernel, 0.0)
    mh = jnp.asarray(_toeplitz(W, taps, pad), heatmaps.dtype)
    # vertical matrix used as mv[h, y]: row h holds taps centered at y=h
    mv = jnp.asarray(_toeplitz(H, taps, pad).T, heatmaps.dtype)
    x = jnp.transpose(heatmaps, (0, 3, 1, 2))  # [B, K, H, W]
    out = pl.pallas_call(
        _blur_log_kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, H, W), heatmaps.dtype),
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W), lambda b, k: (b, k, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, mv, mh)
    return jnp.transpose(out, (0, 2, 3, 1))  # [B, H, W, K]
