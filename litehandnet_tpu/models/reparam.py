"""Functional RepVGG re-parameterization.

The reference fuses branches by in-place module surgery at deploy time
(repblocks.py:46-73, 169-236; common.py:68-90). In a functional framework the
same thing is a **pure transform over the params pytree**: walk the train-mode
variables ({'params', 'batch_stats'}), find Rep-module subtrees by their child
names, and emit the deploy-mode params where each subtree is a single biased
conv. The deploy module graph (RepConv/RepBlock/ChannelAttention with
``deploy=True``) consumes the result; BN disappears entirely.

Fusion math (HWIO kernels, per output channel o):
    t_o   = gamma_o / sqrt(var_o + eps)
    K'    = K * t                     (broadcast over last axis)
    b'    = beta - mean * t
RepBlock adds the 1x1 branch zero-padded to kxk and the identity branch as a
delta kernel (reference: repblocks.py:169-212).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


def _fuse_conv_bn(conv: Mapping, bn_p: Mapping, bn_s: Mapping):
    kernel = conv["kernel"]
    t = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
    fused_kernel = kernel * t  # t broadcasts over the last (out) axis
    fused_bias = bn_p["bias"] - bn_s["mean"] * t
    return fused_kernel, fused_bias


def _fuse_bn_identity(bn_p: Mapping, bn_s: Mapping, kernel_size: int,
                      in_per_group: int, features: int):
    """Identity-BN branch as an equivalent kxk delta-kernel conv."""
    k = kernel_size
    mid = k // 2
    kernel = np.zeros((k, k, in_per_group, features), np.float32)
    for o in range(features):
        kernel[mid, mid, o % in_per_group, o] = 1.0
    t = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
    return jnp.asarray(kernel) * t, bn_p["bias"] - bn_s["mean"] * t


def _pad_1x1_to_kxk(kernel: jnp.ndarray, k: int) -> jnp.ndarray:
    pad = k // 2
    return jnp.pad(kernel, ((pad, pad), (pad, pad), (0, 0), (0, 0)))


def _is_repconv(p: Mapping) -> bool:
    return "main" in p and "main_bn" in p


def _is_repblock(p: Mapping) -> bool:
    return "dense" in p and "dense_bn" in p and "one" in p and "one_bn" in p


def _is_channel_attention(p: Mapping) -> bool:
    return "att" in p and "att_bn" in p and "fc_down" in p and "fc_up" in p


def _fuse_node(p: Mapping, s: Mapping) -> dict:
    """Fuse one Rep-module params subtree into its deploy layout."""
    if _is_repconv(p):
        kernel, bias = _fuse_conv_bn(
            p["main"]["conv"], p["main_bn"]["bn"], s["main_bn"]["bn"]
        )
        return {"rep": {"conv": {"kernel": kernel, "bias": bias}}}

    if _is_repblock(p):
        dense_k = p["dense"]["conv"]["kernel"]
        kh, _, in_per_group, features = dense_k.shape
        kernel, bias = _fuse_conv_bn(
            p["dense"]["conv"], p["dense_bn"]["bn"], s["dense_bn"]["bn"]
        )
        k1, b1 = _fuse_conv_bn(
            p["one"]["conv"], p["one_bn"]["bn"], s["one_bn"]["bn"]
        )
        kernel = kernel + _pad_1x1_to_kxk(k1, kh)
        bias = bias + b1
        if "id_bn" in p:
            kid, bid = _fuse_bn_identity(
                p["id_bn"]["bn"], s["id_bn"]["bn"], kh, in_per_group, features
            )
            kernel = kernel + kid
            bias = bias + bid
        return {"rep": {"conv": {"kernel": kernel, "bias": bias}}}

    if _is_channel_attention(p):
        kernel, bias = _fuse_conv_bn(
            p["att"]["conv"], p["att_bn"]["bn"], s["att_bn"]["bn"]
        )
        return {
            "att_rep": {"conv": {"kernel": kernel, "bias": bias}},
            "fc_down": p["fc_down"],
            "fc_up": p["fc_up"],
        }

    raise ValueError("not a rep node")


def _walk(p: Any, s: Any) -> Any:
    if not isinstance(p, Mapping):
        return p
    if _is_repconv(p) or _is_repblock(p) or _is_channel_attention(p):
        return _fuse_node(p, s if isinstance(s, Mapping) else {})
    out = {}
    for key, val in p.items():
        sub_s = s.get(key, {}) if isinstance(s, Mapping) else {}
        out[key] = _walk(val, sub_s)
    return out


def fold_input_normalization(
    variables: Mapping,
    mean,
    std,
    conv_path=("pre", "c1", "rep", "conv"),
) -> dict:
    """Fold ``(x - mean) / std`` input normalization into the first conv.

    Deploy-time serving transform: the returned variables consume RAW pixel
    values (e.g. uint8 0..255 cast to the compute dtype), removing the
    elementwise normalize pass (and its HBM round-trip) from the pipeline.
    For a conv with HWIO kernel K and bias b,
        conv((x - mean)/std; K, b) == conv(x; K/std, b - sum_hw K/std @ mean)
    everywhere the conv window reads real pixels.

    Exact wherever the conv window reads only real pixels — in particular
    for a VALID-padded first conv. Where zero-padding IS read, a padded zero
    now means raw 0 (normalized ``-mean/std``) instead of normalized 0, so
    the first feature map's border ring shifts. How far that propagates is
    architecture-dependent: in nets with global pooling on the trunk
    (LiteHandNet's encoder shortcut and channel-attention gates) the border
    delta reaches every output, so do NOT use this on such models without
    validating accuracy with the trained weights; in purely local conv
    stacks it stays confined near the crop border.

    Args:
        variables: deploy-mode ``{'params': ...}`` (from :func:`fuse_params`
            or a ``deploy=True`` init).
        mean, std: per-channel stats in the same units as the raw input
            (for 0..255 uint8 pixels, the ImageNet stats * 255).
        conv_path: key path of the first conv's ``{'kernel','bias'}`` dict
            inside ``variables['params']``. Default is LiteHandNet's fused
            stem conv.

    Returns:
        New variables dict; everything outside ``conv_path`` is shared.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def rebuild(node: Mapping, path) -> dict:
        if not path:
            kernel = node["kernel"].astype(jnp.float32)
            bias = node["bias"].astype(jnp.float32)
            folded_k = kernel / std[None, None, :, None]
            folded_b = bias - jnp.einsum("hwco,c->o", folded_k, mean)
            return {
                "kernel": folded_k.astype(node["kernel"].dtype),
                "bias": folded_b.astype(node["bias"].dtype),
            }
        out = dict(node)
        out[path[0]] = rebuild(node[path[0]], path[1:])
        return out

    out = dict(variables)
    out["params"] = rebuild(variables["params"], tuple(conv_path))
    return out


def fuse_params(variables: Mapping) -> dict:
    """Map train-mode variables to deploy-mode variables.

    Args:
        variables: {'params': ..., 'batch_stats': ...} from a train-mode
            model (``deploy=False``).

    Returns:
        {'params': ...} for the same model constructed with ``deploy=True``.
        Non-rep BatchNorms (if any remain) are left untouched, so pass any
        remaining 'batch_stats' through at apply time.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return {"params": _walk(params, stats)}
