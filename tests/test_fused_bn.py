"""Fused BN-statistics kernels (ops/fused_bn.py) vs reference math.

On CPU the public entry points take their jnp fallback; the Pallas
bodies themselves are exercised through `interpret=True` wrappers so the
kernel logic (Chan block combine, shifted-MAC depthwise conv) is
verified everywhere, not just on TPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from litehandnet_tpu.ops import fused_bn


def _interp_moments(x2, block_rows):
    M, C = x2.shape
    kernel = functools.partial(fused_bn._moments_kernel, n_total_f=float(M))
    mean, var = pl.pallas_call(
        kernel,
        grid=(M // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((3, C), jnp.float32)],
        interpret=True,
    )(x2)
    return mean[0], var[0]


@pytest.mark.parametrize("mean_scale", [0.0, 250.0])
def test_moments_kernel_two_pass_numerics(rng, mean_scale):
    """Chan-combined block stats must match f64 two-pass even at
    |mean|/std = 250 (the regime where one-pass E[x^2]-E[x]^2 loses
    8.5e-2 relative, PROFILE.md 'BN-statistics cost')."""
    x = (rng.randn(64 * 16, 128) + mean_scale).astype(np.float32)
    mean, var = _interp_moments(jnp.asarray(x), block_rows=64)
    want_mean = x.astype(np.float64).mean(0)
    want_var = x.astype(np.float64).var(0)
    np.testing.assert_allclose(np.asarray(mean), want_mean, rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(var), want_var, rtol=1e-4)


def test_moments_fallback_and_grad(rng):
    x = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32))
    mean, var = fused_bn.moments(x)
    wm, wv = fused_bn._moments_ref(x)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(wm), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(wv), rtol=1e-5)

    def loss_fused(x):
        m, v = fused_bn.moments(x)
        return jnp.sum(m * 3.0) + jnp.sum(v * 0.5)

    def loss_ref(x):
        m, v = fused_bn._moments_ref(x)
        return jnp.sum(m * 3.0) + jnp.sum(v * 0.5)

    g_fused = jax.grad(loss_fused)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-7)


def _interp_dw(x, w, dilation):
    N, H, W, C = x.shape
    kernel = functools.partial(
        fused_bn._dw_stats_kernel, dilation=dilation,
        n_total_f=float(N * H * W))
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
        interpret=True,
    )(x, w)
    return y, mean[0], var[0]


@pytest.mark.parametrize("dilation", [1, 2])
def test_dw_conv_stats_kernel_matches_xla(rng, dilation):
    N, H, W, C = 3, 16, 16, 128
    x = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, C) * 0.3).astype(np.float32))
    y, mean, var = _interp_dw(x, w, dilation)
    y_ref = fused_bn._dw_ref(x, w, dilation)
    m_ref, v_ref = fused_bn._moments_ref(y_ref)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(m_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(v_ref), rtol=1e-4, atol=1e-6)


def test_repconv_fused_branch_matches_conv_branch(rng, monkeypatch):
    """RepConv's fused train path (_NestedKernel + precomputed-stats BN)
    must consume Conv-initialized params unchanged and reproduce the
    plain conv->BN path bit-for-bit (incl. updated batch_stats). Forced
    on CPU by patching _dw_fusable; the op itself falls back to the
    reference math, so this isolates the param-path + BN wiring."""
    from litehandnet_tpu.models import layers

    model = layers.RepConv(features=32, kernel=3, stride=1, padding=1,
                           groups=32, act=None)
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "conv" in variables["params"]["main"]

    def run():
        return model.apply(variables, x, train=True,
                           mutable=["batch_stats"])

    monkeypatch.setattr(layers.RepConv, "_dw_fusable", lambda self, x: False)
    y_conv, st_conv = run()
    monkeypatch.setattr(layers.RepConv, "_dw_fusable", lambda self, x: True)
    y_fused, st_fused = run()

    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_conv),
                               rtol=1e-6, atol=1e-6)
    for leaf in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(st_fused["batch_stats"]["main_bn"]["bn"][leaf]),
            np.asarray(st_conv["batch_stats"]["main_bn"]["bn"][leaf]),
            rtol=1e-6, atol=1e-7)


def test_dw_conv_stats_grad_matches_reference(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 32) * 0.3).astype(np.float32))

    def loss(fn):
        def inner(x, w):
            y, m, v = fn(x, w, 1)
            return jnp.sum(y * 0.1) + jnp.sum(m) + jnp.sum(v * 2.0)
        return inner

    def ref(x, w, dilation):
        y = fused_bn._dw_ref(x, w, dilation)
        m, v = fused_bn._moments_ref(y)
        return y, m, v

    gx, gw = jax.grad(loss(fused_bn.dw_conv3x3_stats), argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), rtol=1e-5,
                               atol=1e-6)
