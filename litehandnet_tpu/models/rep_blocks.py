"""YOLOv5-style block library (NHWC) — the reference's unfinished rep variant.

Reference: models/rep_pose_hg_ms_att.py:6-63 — Conv (conv+BN+SiLU with a
``forward_fuse`` deploy path), DWConv (groups = gcd(c1, c2)), Bottleneck,
CrossConv (1xk then kx1 downsample), Focus (space-to-depth stem). The file
is dead code reference-side: nothing imports it, and it calls an
``autopad`` helper it never defines (the standard YOLOv5
``k // 2``-when-unset padding, reproduced here as :func:`autopad`), so it
cannot even run as checked in. It is rebuilt here so the inventory row has
a working TPU-native counterpart: same module graph and parameter names
(``conv``/``bn``/``cv1``/``cv2``), torch-weight-transfer forward parity in
tests/test_rep_blocks.py, and the deploy fusion expressed as a pure
params->params transform (:func:`fuse_conv_bn`) instead of in-place module
surgery.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Mapping, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.layers import TorchBatchNorm, silu
from litehandnet_tpu.models.reparam import _fuse_conv_bn


def autopad(k, p=None):
    """'same'-output padding for odd kernels when p is unset (YOLOv5
    common.py convention; the helper rep_pose_hg_ms_att.py:10 calls but
    never defines)."""
    if p is None:
        p = k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)
    return p


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class ConvBnAct(nn.Module):
    """Reference ``Conv`` (rep_pose_hg_ms_att.py:6-18): conv -> BN -> act.

    ``act=True`` is SiLU, ``False``/``None`` is identity, and a callable is
    used as-is (the reference also accepts an ``nn.Module``). With
    ``deploy=True`` the module is the reference's ``forward_fuse``: a single
    biased conv (BN folded by :func:`fuse_conv_bn`) followed by act.
    """

    features: int
    kernel: Union[int, tuple] = 1
    stride: Union[int, tuple] = 1
    padding: Optional[Union[int, tuple]] = None
    groups: int = 1
    act: Union[bool, Callable, None] = True
    deploy: bool = False
    dtype: Any = None

    def _act(self, y):
        if self.act is True:
            return silu(y)
        if callable(self.act):
            return self.act(y)
        return y

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel)
        p = _pair(autopad(self.kernel, self.padding))
        y = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=((p[0], p[0]), (p[1], p[1])),
            feature_group_count=self.groups,
            use_bias=self.deploy,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.deploy:
            y = TorchBatchNorm(
                use_running_average=not train, dtype=self.dtype, name="bn"
            )(y)
        return self._act(y)


def dw_conv(c1: int, c2: int, k=1, s=1, act=True, **kw) -> ConvBnAct:
    """Reference ``DWConv`` (rep_pose_hg_ms_att.py:20-24): grouped conv with
    groups = gcd(c_in, c_out). Needs c1 explicitly (flax infers input
    channels only at call time, after the group count must be fixed)."""
    return ConvBnAct(
        features=c2, kernel=k, stride=s, groups=math.gcd(c1, c2), act=act,
        **kw,
    )


class Bottleneck(nn.Module):
    """Reference ``Bottleneck`` (rep_pose_hg_ms_att.py:27-38): 1x1 reduce ->
    3x3 (grouped), residual add iff ``shortcut`` and channels match."""

    features: int
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    deploy: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 1, 1, deploy=self.deploy, dtype=self.dtype,
                      name="cv1")(x, train=train)
        y = ConvBnAct(self.features, 3, 1, groups=self.groups,
                      deploy=self.deploy, dtype=self.dtype,
                      name="cv2")(y, train=train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class CrossConv(nn.Module):
    """Reference ``CrossConv`` (rep_pose_hg_ms_att.py:41-52): factorized
    (1,k) stride (1,s) then (k,1) stride (s,1) downsample, optional
    residual."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    expansion: float = 1.0
    shortcut: bool = False
    deploy: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, (1, self.kernel), (1, self.stride),
                      deploy=self.deploy, dtype=self.dtype,
                      name="cv1")(x, train=train)
        y = ConvBnAct(self.features, (self.kernel, 1), (self.stride, 1),
                      groups=self.groups, deploy=self.deploy,
                      dtype=self.dtype, name="cv2")(y, train=train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class Focus(nn.Module):
    """Reference ``Focus`` (rep_pose_hg_ms_att.py:55-63): 2x2 space-to-depth
    (slice order [even,even], [odd,even], [even,odd], [odd,odd] over (h, w),
    slice-major channel concat — matching torch's dim-1 cat so weights
    transfer), then ``Conv``."""

    features: int
    kernel: Union[int, tuple] = 1
    stride: Union[int, tuple] = 1
    padding: Optional[Union[int, tuple]] = None
    groups: int = 1
    act: Union[bool, Callable, None] = True
    deploy: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :],
             x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return ConvBnAct(
            self.features, self.kernel, self.stride, self.padding,
            groups=self.groups, act=self.act, deploy=self.deploy,
            dtype=self.dtype, name="conv",
        )(y, train=train)


def fuse_conv_bn(variables: Mapping) -> dict:
    """Deploy transform (reference ``forward_fuse``): fold every
    ``{conv, bn}`` sibling pair in a train-mode variables tree into a single
    biased conv, recursively; returns ``{'params': ...}`` for the
    ``deploy=True`` module graph. Pure params->params, mirroring
    models/reparam.py's treatment of RepConv."""

    def walk(p: Mapping, s: Mapping) -> dict:
        if ("bn" in p and "conv" in p and isinstance(p["conv"], Mapping)
                and "kernel" in p["conv"]):
            kern, bias = _fuse_conv_bn(p["conv"], p["bn"], s["bn"])
            return {"conv": {"kernel": kern, "bias": bias}}
        out = {}
        for name, sub in p.items():
            if isinstance(sub, Mapping):
                out[name] = walk(sub, s.get(name, {}))
            else:
                out[name] = sub
        return out

    return {"params": walk(variables["params"],
                           variables.get("batch_stats", {}))}
