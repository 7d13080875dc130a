"""Import reference (PyTorch) checkpoints into litehandnet_tpu Flax variables.

The reference framework (models/__init__.py:20-26 and the family files under
models/pose_estimation/) stores weights as torch ``state_dict``s in
OIHW/NCHW conventions. This module converts such a state_dict into the
``{'params': ..., 'batch_stats': ...}`` variables tree of the corresponding
NHWC Flax model, enabling (a) migration of trained reference checkpoints and
(b) numeric forward-parity testing of every model family.

Conversion rules per tensor kind:
  conv    OIHW (out, in/groups, kh, kw)  -> HWIO (kh, kw, in/groups, out)
  deconv  (in, out, kh, kw)              -> (kh, kw, in, out), spatially
          flipped (torch ConvTranspose2d is the gradient-of-conv; flax
          nn.ConvTranspose is a fractionally-strided conv — verified
          numerically to machine precision)
  linear  (out, in)                      -> (in, out)
  bn      weight/bias -> params scale/bias; running_* -> batch_stats

Each family contributes a table of (regex over the torch key prefix, kind,
flax path template); `convert_state_dict` applies it and `fill_variables`
grafts the result onto a target tree with shape checking.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def t_conv(w):
    return np.transpose(_np(w), (2, 3, 1, 0))


def t_deconv(w):
    return np.transpose(_np(w), (2, 3, 0, 1))[::-1, ::-1]


def t_linear(w):
    return np.transpose(_np(w))


def t_copy(w):
    return _np(w)


# kind -> {torch leaf name: (collection, flax leaf name, transform)}
_KINDS: Dict[str, Dict[str, Tuple[str, str, Callable]]] = {
    "conv": {
        "weight": ("params", "kernel", t_conv),
        "bias": ("params", "bias", t_copy),
    },
    # ConvModule-style conv whose Flax twin is biasless: the torch conv bias
    # is folded into the adjacent BatchNorm's running mean (BN(Wx+b) with
    # stats (mu, var) == BN(Wx) with (mu-b, var)); template names the conv
    # path '<block>/conv/conv', the BN lives at '<block>/norm/bn'.
    "conv_fold": {
        "weight": ("params", "kernel", t_conv),
        "bias": ("_fold_bn_mean", "", t_copy),
    },
    "deconv": {
        "weight": ("params", "kernel", t_deconv),
        "bias": ("params", "bias", t_copy),
    },
    "linear": {
        "weight": ("params", "kernel", t_linear),
        "bias": ("params", "bias", t_copy),
    },
    "bn": {
        "weight": ("params", "scale", t_copy),
        "bias": ("params", "bias", t_copy),
        "running_mean": ("batch_stats", "mean", t_copy),
        "running_var": ("batch_stats", "var", t_copy),
    },
    "scalar": {  # bare tensors (e.g. learned loss weights)
        "": ("params", "", t_copy),
    },
}

Rule = Tuple[str, str, str]  # (prefix regex, kind, flax path template)


class ConversionError(ValueError):
    pass


def convert_state_dict(state_dict, rules: Sequence[Rule]) -> dict:
    """Map a torch state_dict through per-family rules.

    Args:
        state_dict: torch name -> tensor.
        rules: (regex over the key prefix — the key minus its final
            '.leaf' component — , kind, '/'-joined flax module-path template (no collection prefix) with
            \\1-style backrefs).

    Returns:
        {'params': nested dict, 'batch_stats': nested dict}

    Raises:
        ConversionError: a non-buffer key matched no rule.
    """
    compiled = [(re.compile(p), kind, tmpl) for p, kind, tmpl in rules]
    out: dict = {"params": {}, "batch_stats": {}}
    folds: List[Tuple[List[str], np.ndarray]] = []
    unmatched: List[str] = []
    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        prefix, _, leaf = key.rpartition(".")
        hit = None
        for pat, kind, tmpl in compiled:
            m = pat.fullmatch(prefix if kind != "scalar" else key)
            if m is not None:
                hit = (m, kind, tmpl)
                break
        if hit is None:
            unmatched.append(key)
            continue
        m, kind, tmpl = hit
        if kind == "skip":
            continue
        spec = _KINDS[kind].get(leaf if kind != "scalar" else "")
        if spec is None:
            raise ConversionError(f"{key}: kind {kind!r} has no leaf {leaf!r}")
        collection, flax_leaf, transform = spec
        expanded = tmpl(m) if callable(tmpl) else m.expand(tmpl)
        path = [p for p in expanded.split("/") if p]
        if collection == "_fold_bn_mean":
            if path[-2:] != ["conv", "conv"]:
                raise ConversionError(
                    f"{key}: conv_fold template must end in conv/conv"
                )
            folds.append((path[:-2] + ["norm", "bn"], transform(tensor)))
            continue
        if flax_leaf:
            path = path + [flax_leaf]
        node = out[collection]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = transform(tensor)
    if unmatched:
        raise ConversionError(
            f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:8]}"
        )
    for bn_path, bias in folds:
        node = out["batch_stats"]
        try:
            for p in bn_path:
                node = node[p]
            node["mean"] = node["mean"] - bias
        except KeyError:
            raise ConversionError(
                f"conv_fold: no BN stats at {'/'.join(bn_path)}"
            )
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out


def fill_variables(target, imported, rtol_shapes=True):
    """Graft `imported` onto the structure of `target` (a Flax variables
    tree), checking that every target leaf is provided with the right shape.

    Returns the new variables tree (same treedef as target).

    Raises:
        ConversionError: missing / extra / shape-mismatched leaves.
    """
    import jax

    tgt_flat = jax.tree_util.tree_flatten_with_path(target)[0]
    imp_flat = jax.tree_util.tree_flatten_with_path(imported)[0]

    from litehandnet_tpu.utils.tree import keypath_parts as norm

    imp = {norm(p): leaf for p, leaf in imp_flat}
    leaves = []
    problems = []
    used = set()
    for path, leaf in tgt_flat:
        key = norm(path)
        if key not in imp:
            problems.append(f"missing {'/'.join(key)}")
            leaves.append(leaf)
            continue
        src = imp[key]
        used.add(key)
        if np.shape(src) != np.shape(leaf):
            problems.append(
                f"shape {'/'.join(key)}: torch {np.shape(src)} "
                f"vs flax {np.shape(leaf)}"
            )
            leaves.append(leaf)
            continue
        # force a copy: for CPU torch tensors the converted leaf can be a
        # numpy VIEW of the live parameter storage (tensor.numpy() shares
        # memory), and a later in-place optimizer.step() on the torch side
        # would silently rewrite the "imported" variables
        leaves.append(np.array(src, dtype=np.asarray(leaf).dtype, copy=True))
    extra = set(imp) - used
    if extra:
        problems.append(
            "extra imported leaves: "
            + ", ".join("/".join(k) for k in sorted(extra)[:8])
        )
    if problems:
        raise ConversionError("; ".join(problems[:20]))
    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def import_torch_state_dict(family: str, state_dict, target):
    """One-call import: torch state_dict -> variables matching `target`.

    Args:
        family: registry name (``cfg.MODEL.name``).
        state_dict: the torch checkpoint's state_dict (reference
            ``checkpoint['state_dict']`` / ``model.state_dict()``).
        target: variables tree from ``model.init`` (shapes to fill).
    """
    rules = RULES.get(family.lower())
    if rules is None:
        raise KeyError(
            f"no torch-import rules for {family!r}; available: {sorted(RULES)}"
        )
    return fill_variables(target, convert_state_dict(state_dict, rules))


# ---------------------------------------------------------------------------
# Per-family rule tables. Reference naming cited per family.
# ---------------------------------------------------------------------------

# SimpleBaseline ResNet-18/34 (reference models/pose_estimation/SimpleBaseline/
# resnet.py: stem, res_layers.{s}.{b}.conv.{0,1,3,4}, downsample, out_head)
RULES: Dict[str, List[Rule]] = {}

RULES["resnet"] = _RESNET_BODY = [
    (r"stem\.conv\.0", "conv", r"stem/conv/conv"),
    (r"stem\.conv\.1", "bn", r"stem/norm/bn"),
    # BasicBlock: conv.{0,3} convs, conv.{1,4} bns
    (r"res_layers\.(\d+)\.(\d+)\.conv\.0", "conv", r"layer\1_\2/c1/conv"),
    (r"res_layers\.(\d+)\.(\d+)\.conv\.1", "bn", r"layer\1_\2/bn1/bn"),
    (r"res_layers\.(\d+)\.(\d+)\.conv\.3", "conv", r"layer\1_\2/c2/conv"),
    (r"res_layers\.(\d+)\.(\d+)\.conv\.4", "bn", r"layer\1_\2/bn2/bn"),
    # Bottleneck: conv.{0,3,6} convs, conv.{1,4,7} bns
    (r"res_layers\.(\d+)\.(\d+)\.conv\.6", "conv", r"layer\1_\2/c3/conv"),
    (r"res_layers\.(\d+)\.(\d+)\.conv\.7", "bn", r"layer\1_\2/bn3/bn"),
    (r"res_layers\.(\d+)\.(\d+)\.downsample\.0", "conv",
     r"layer\1_\2/down/conv"),
    (r"res_layers\.(\d+)\.(\d+)\.downsample\.1", "bn",
     r"layer\1_\2/down_bn/bn"),
]

# SimpleBaseline deconv head, shared by resnet + mobilenetv2
# (reference deconv_head.py:19-129)
_DECONV_HEAD: List[Rule] = [
    (r"out_head\.deconv_layers\.0", "deconv", r"head/deconv0"),
    (r"out_head\.deconv_layers\.1", "bn", r"head/bn0/bn"),
    (r"out_head\.deconv_layers\.3", "deconv", r"head/deconv1"),
    (r"out_head\.deconv_layers\.4", "bn", r"head/bn1/bn"),
    (r"out_head\.deconv_layers\.6", "deconv", r"head/deconv2"),
    (r"out_head\.deconv_layers\.7", "bn", r"head/bn2/bn"),
    (r"out_head\.final_layer", "conv", r"head/final/conv"),
]
RULES["resnet"] = _RESNET_BODY + _DECONV_HEAD

# MobileNetV2 (reference models/pose_estimation/SimpleBaseline/mobilenetv2.py:
# conv1, layer{1..7}.{b}.conv.{i} InvertedResiduals, conv2, out_head).
# layer1 blocks have no expand conv (expand_ratio=1): conv.0=dw, conv.1=project.
RULES["mobilenetv2"] = [
    (r"conv1\.conv\.0", "conv_fold", r"conv1/conv/conv"),
    (r"conv1\.conv\.1", "bn", r"conv1/norm/bn"),
    (r"layer1\.(\d+)\.conv\.0\.conv\.0", "conv_fold", r"layer1_\1/dw/conv/conv"),
    (r"layer1\.(\d+)\.conv\.0\.conv\.1", "bn", r"layer1_\1/dw/norm/bn"),
    (r"layer1\.(\d+)\.conv\.1\.conv\.0", "conv_fold",
     r"layer1_\1/project/conv/conv"),
    (r"layer1\.(\d+)\.conv\.1\.conv\.1", "bn", r"layer1_\1/project/norm/bn"),
    (r"layer(\d+)\.(\d+)\.conv\.0\.conv\.0", "conv_fold",
     r"layer\1_\2/expand/conv/conv"),
    (r"layer(\d+)\.(\d+)\.conv\.0\.conv\.1", "bn", r"layer\1_\2/expand/norm/bn"),
    (r"layer(\d+)\.(\d+)\.conv\.1\.conv\.0", "conv_fold",
     r"layer\1_\2/dw/conv/conv"),
    (r"layer(\d+)\.(\d+)\.conv\.1\.conv\.1", "bn", r"layer\1_\2/dw/norm/bn"),
    (r"layer(\d+)\.(\d+)\.conv\.2\.conv\.0", "conv_fold",
     r"layer\1_\2/project/conv/conv"),
    (r"layer(\d+)\.(\d+)\.conv\.2\.conv\.1", "bn", r"layer\1_\2/project/norm/bn"),
    (r"conv2\.conv\.0", "conv_fold", r"conv2/conv/conv"),
    (r"conv2\.conv\.1", "bn", r"conv2/norm/bn"),
] + _DECONV_HEAD


def _repconv(tp: str, fp: str) -> List[Rule]:
    """Reference RepConv (repblocks.py:23-74): one conv_bn branch named
    'conv' -> flax RepConv 'main'/'main_bn' (models/layers.py)."""
    return [
        (tp + r"\.conv\.conv", "conv", fp + r"/main/conv"),
        (tp + r"\.conv\.bn", "bn", fp + r"/main_bn/bn"),
    ]


def _repblock(tp: str, fp: str) -> List[Rule]:
    """Reference RepBlock (repblocks.py:76-175): rbr_dense + rbr_1x1 +
    optional rbr_identity BN -> flax dense/one/id_bn branches."""
    return [
        (tp + r"\.rbr_dense\.conv", "conv", fp + r"/dense/conv"),
        (tp + r"\.rbr_dense\.bn", "bn", fp + r"/dense_bn/bn"),
        (tp + r"\.rbr_1x1\.conv", "conv", fp + r"/one/conv"),
        (tp + r"\.rbr_1x1\.bn", "bn", fp + r"/one_bn/bn"),
        (tp + r"\.rbr_identity", "bn", fp + r"/id_bn/bn"),
    ]


def _litehandnet_rules() -> List[Rule]:
    """LiteHandNet (reference liteHandNet.py:196-244): Stem 'pre', hourglass
    'hgs' (MSAB at encoder.0/decoder.last, Residual elsewhere), 'features',
    'out_layer'."""
    rules: List[Rule] = []
    # Stem (liteHandNet.py:169-194)
    rules += _repblock(r"pre\.conv1\.0", r"pre/c1")
    rules += _repblock(r"pre\.conv1\.1", r"pre/c2")
    rules += _repconv(r"pre\.branch1\.0", r"pre/b1a")
    rules += _repconv(r"pre\.branch1\.1", r"pre/b1b")
    rules.append((r"pre\.conv1x1", "conv", r"pre/proj/conv"))
    for t, f in (("encoder", "enc"), ("decoder", "dec")):
        P = rf"hgs\.{t}\.(\d+)"
        F = rf"hgs/{f}\1"
        # MSAB (liteHandNet.py:117-167)
        rules += _repconv(P + r"\.conv1", F + r"/conv1")
        rules += _repconv(P + r"\.conv2", F + r"/conv2")
        for mid, pn in (("mid1_conv", "p1"), ("mid2_conv", "p2")):
            for j, ab in (("0", "a"), ("1", "b")):
                rules += _repconv(
                    P + rf"\.{mid}\.(\d+)\.{j}\.depthwise_conv",
                    F + rf"/{pn}_\2_{ab}/dw",
                )
                rules += _repconv(
                    P + rf"\.{mid}\.(\d+)\.{j}\.pointwise_conv",
                    F + rf"/{pn}_\2_{ab}/pw",
                )
        # ChannelAttension (common.py:40-75) / SEBlock (common.py:23-37)
        rules += [
            (P + r"\.ca\.conv3x3\.conv", "conv", F + r"/ca/att/conv"),
            (P + r"\.ca\.conv3x3\.bn", "bn", F + r"/ca/att_bn/bn"),
            (P + r"\.ca\.conv1x1\.1", "conv", F + r"/ca/fc_down/conv"),
            (P + r"\.ca\.conv1x1\.3", "conv", F + r"/ca/fc_up/conv"),
            (P + r"\.ca\.down", "conv", F + r"/ca/down/conv"),
            (P + r"\.ca\.up", "conv", F + r"/ca/up/conv"),
        ]
        # Residual = BasicBlock conv1 + BottleNeck blocks (liteHandNet.py:39-69)
        rules += _repconv(P + r"\.conv1\.conv\.0", F + r"/c1/c1")
        rules += _repconv(P + r"\.conv1\.conv\.1", F + r"/c1/c2")
        rules += _repconv(P + r"\.conv1\.skip_layer", F + r"/c1/skip")
        for k in ("0", "1", "2"):
            rules += _repconv(
                P + rf"\.blocks\.(\d+)\.conv\.{k}", F + rf"/b\2/c{int(k) + 1}"
            )
    # features tail + head (liteHandNet.py:222-228)
    for k in ("0", "1", "2"):
        rules += _repconv(rf"features\.0\.conv\.{k}", rf"feat_b/c{int(k) + 1}")
    rules += _repconv(r"features\.1", r"feat_c")
    rules.append((r"out_layer", "conv", r"head/conv"))
    return rules


RULES["litehandnet"] = _litehandnet_rules()


def _srhandnet_rules() -> List[Rule]:
    """SRHandNet (reference models/pose_estimation/SRHandNet/SRhandNet.py):
    3-conv stem, residual blocks 1-7 (conv3x3.{0,1,3,4} + optional conv1x1
    projection skip), 1x1 output heads at blocks 4-7."""

    def res(tp, fp):
        return [
            (tp + r"\.conv3x3\.0", "conv", fp + r"/c1/conv"),
            (tp + r"\.conv3x3\.1", "bn", fp + r"/bn1/bn"),
            (tp + r"\.conv3x3\.3", "conv", fp + r"/c2/conv"),
            (tp + r"\.conv3x3\.4", "bn", fp + r"/bn2/bn"),
            (tp + r"\.conv1x1", "conv", fp + r"/skip/conv"),
        ]

    rules: List[Rule] = [(r"stem\.conv(\d)", "conv", r"stem/c\1/conv")]
    for n in "1234567":
        f = (f"b{n}" if n in "123" else f"h{n}")
        rules += res(rf"block{n}\.0", f + "a")
        rules += res(rf"block{n}\.1", f + "b")
        if n in "4567":
            rules.append((rf"block{n}\.2", "conv", rf"h{n}out/conv"))
    return rules


RULES["srhandnet"] = _srhandnet_rules()


def _litehrnet_rules() -> List[Rule]:
    """Lite-HRNet 18/30 (reference models/pose_estimation/lite_hrnet.py):
    shuffle stem, DW transitions (flat + nested), conditional-channel-
    weighting stages (cross-resolution + spatial weighting), fuse layers,
    iterative head."""
    R: List[Rule] = [
        (r"stem\.conv1\.0", "conv", r"stem/c1/conv"),
        (r"stem\.conv1\.1", "bn", r"stem/bn1/bn"),
        (r"stem\.branch1\.depthwise_conv\.0", "conv", r"stem/branch1/dw/conv"),
        (r"stem\.branch1\.depthwise_conv\.1", "bn", r"stem/branch1/dw_bn/bn"),
        (r"stem\.branch1\.pointwise_conv\.0", "conv", r"stem/branch1/pw/conv"),
        (r"stem\.branch1\.pointwise_conv\.1", "bn", r"stem/branch1/pw_bn/bn"),
        (r"stem\.expand_conv\.0", "conv", r"stem/expand/conv"),
        (r"stem\.expand_conv\.1", "bn", r"stem/expand_bn/bn"),
        (r"stem\.depthwise_conv\.0", "conv", r"stem/dw/conv"),
        (r"stem\.depthwise_conv\.1", "bn", r"stem/dw_bn/bn"),
        (r"stem\.linear_conv\.0", "conv", r"stem/linear/conv"),
        (r"stem\.linear_conv\.1", "bn", r"stem/linear_bn/bn"),
    ]
    for dw, fl in (("depthwise_conv", "dw"), ("pointwise_conv", "pw")):
        R += [
            (rf"transition(\d+)\.(\d+)\.{dw}\.0", "conv",
             rf"trans\1_\2/{fl}/conv"),
            (rf"transition(\d+)\.(\d+)\.{dw}\.1", "bn",
             rf"trans\1_\2/{fl}_bn/bn"),
            (rf"transition(\d+)\.(\d+)\.(\d+)\.{dw}\.0", "conv",
             rf"trans\1_\2_\3/{fl}/conv"),
            (rf"transition(\d+)\.(\d+)\.(\d+)\.{dw}\.1", "bn",
             rf"trans\1_\2_\3/{fl}_bn/bn"),
            (rf"head_layer\.projects\.(\d+)\.{dw}\.0", "conv",
             rf"head/proj\1/{fl}/conv"),
            (rf"head_layer\.projects\.(\d+)\.{dw}\.1", "bn",
             rf"head/proj\1/{fl}_bn/bn"),
            (rf"stage(\d+)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.{dw}\.0",
             "conv", rf"stage\1_\2/fuse\3_\4_\5/{fl}/conv"),
            (rf"stage(\d+)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.{dw}\.1",
             "bn", rf"stage\1_\2/fuse\3_\4_\5/{fl}_bn/bn"),
        ]
    ST = r"stage(\d+)\.(\d+)\.layers\.(\d+)"
    FS = r"stage\1_\2/ccw\3"
    R += [
        (ST + r"\.cross_resolution_weighting\.conv1\.0", "conv",
         FS + r"/crw/c1/conv"),
        (ST + r"\.cross_resolution_weighting\.conv1\.1", "bn",
         FS + r"/crw/bn1/bn"),
        (ST + r"\.cross_resolution_weighting\.conv2\.0", "conv",
         FS + r"/crw/c2/conv"),
        (ST + r"\.cross_resolution_weighting\.conv2\.1", "bn",
         FS + r"/crw/bn2/bn"),
        (ST + r"\.depthwise_convs\.(\d+)\.0", "conv", FS + r"/dw\4/conv"),
        (ST + r"\.depthwise_convs\.(\d+)\.1", "bn", FS + r"/dw\4_bn/bn"),
        (ST + r"\.spatial_weighting\.(\d+)\.conv1\.0", "conv",
         FS + r"/sw\4/c1/conv"),
        (ST + r"\.spatial_weighting\.(\d+)\.conv2\.0", "conv",
         FS + r"/sw\4/c2/conv"),
        # cross-resolution fuse: upsample path = [1x1 conv, BN]
        (r"stage(\d+)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.0", "conv",
         r"stage\1_\2/fuse\3_\4/conv"),
        (r"stage(\d+)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.1", "bn",
         r"stage\1_\2/fuse\3_\4_bn/bn"),
        (r"out_conv", "conv", r"out_conv/conv"),
    ]
    return R


RULES["litehrnet"] = _litehrnet_rules()


def _hourglass_rules() -> List[Rule]:
    """Stacked hourglass (reference models/pose_estimation/hourglassnet.py,
    princeton-vl style): pre.{0..3}, hgs.{n}.0 recursive low1/low2/low3/up1
    Residual tree, features.{n}.{0,1}, outs, merge_features, merge_preds."""
    TREE = r"((?:low\d|up\d)(?:\.(?:low\d|up\d))*)"

    def tree(m, tail):
        return (
            f"hg{m.group(1)}/" + m.group(2).replace(".", "/") + "/"
            + tail.format(*m.groups()[2:])
        )

    def residual(tp, fp_prefix):
        """fp_prefix: str template; leaf paths c{k}/conv/conv, bn{k}/bn,
        skip/conv/conv."""
        return [
            (tp + r"\.conv(\d)\.conv", "conv",
             lambda m, fp=fp_prefix: m.expand(fp) + f"/c{m.groups()[-1]}/conv/conv"),
            (tp + r"\.bn(\d)", "bn",
             lambda m, fp=fp_prefix: m.expand(fp) + f"/bn{m.groups()[-1]}/bn"),
            (tp + r"\.skip_layer\.conv", "conv",
             lambda m, fp=fp_prefix: m.expand(fp) + "/skip/conv/conv"),
        ]

    # torch pre indices: 0=ConvModule, 1/3/4=Residuals (2 is a paramless
    # MaxPool); flax numbers them densely pre0..pre3
    R: List[Rule] = [
        (r"pre\.0\.conv", "conv", r"pre0/conv/conv"),
        (r"pre\.0\.bn", "bn", r"pre0/norm/bn"),
    ]
    for ti, fi in (("1", "1"), ("3", "2"), ("4", "3")):
        R += residual(rf"pre\.{ti}", rf"pre{fi}")
    R += [
        (rf"hgs\.(\d+)\.0\.{TREE}\.conv(\d)\.conv", "conv",
         lambda m: tree(m, "c{0}/conv/conv")),
        (rf"hgs\.(\d+)\.0\.{TREE}\.bn(\d)", "bn",
         lambda m: tree(m, "bn{0}/bn")),
        (rf"hgs\.(\d+)\.0\.{TREE}\.skip_layer\.conv", "conv",
         lambda m: tree(m, "skip/conv/conv")),
    ]
    R += residual(r"features\.(\d+)\.0", r"feat\1_res")
    R += [
        (r"features\.(\d+)\.1\.conv", "conv", r"feat\1_conv/conv/conv"),
        (r"features\.(\d+)\.1\.bn", "bn", r"feat\1_conv/norm/bn"),
        (r"outs\.(\d+)\.conv", "conv", r"out\1/conv/conv"),
        (r"outs\.(\d+)", "conv", r"out\1/conv/conv"),
        (r"merge_features\.(\d+)\.conv\.conv", "conv", r"merge_feat\1/conv/conv"),
        (r"merge_preds\.(\d+)\.conv\.conv", "conv", r"merge_pred\1/conv/conv"),
    ]
    return R


RULES["hourglass"] = _hourglass_rules()


def _mynet_rules() -> List[Rule]:
    """Gen-1 MultiScaleAttentionHourglass (reference models/pose_hg_ms_att.py):
    pelee stem, BRC(BN-SiLU-conv) ME_att blocks with AdaptiveAvgPool
    attention, plain-conv Residual/BottleNeck towers, features tail."""
    R: List[Rule] = [
        # my_pelee_stem (pose_hg_ms_att.py:190-221)
        (r"pre\.conv1\.0", "conv", r"pre/c1/conv"),
        (r"pre\.conv1\.1", "bn", r"pre/bn1/bn"),
        (r"pre\.conv1\.3", "conv", r"pre/c2/conv"),
        (r"pre\.conv1\.4", "bn", r"pre/bn2/bn"),
        (r"pre\.branch1\.0", "conv", r"pre/b1a/conv"),
        (r"pre\.branch1\.1", "bn", r"pre/b1a_bn/bn"),
        (r"pre\.branch1\.3", "conv", r"pre/b1b/conv"),
        (r"pre\.branch1\.4", "bn", r"pre/b1b_bn/bn"),
        (r"pre\.conv1x1", "conv", r"pre/proj/conv"),
    ]
    for t, f in (("encoder", "enc"), ("decoder", "dec")):
        P = rf"hgs\.{t}\.(\d+)"
        F = rf"hgs/{f}\1"
        # ME_att (pose_hg_ms_att.py:135-186): BRC conv1/conv2 + DW ladders
        R += [
            (P + r"\.conv(\d)\.conv", "conv", F + r"/conv\2/conv/conv"),
            (P + r"\.conv(\d)\.bn", "bn", F + r"/conv\2/norm/bn"),
            (P + r"\.att\.1", "bn", F + r"/att_bn/bn"),
            (P + r"\.att\.3", "conv", F + r"/att_conv/conv"),
            (P + r"\.att\.6", "linear", F + r"/att_fc"),
        ]
        for mid, pn in (("mid1_conv", "p1"), ("mid2_conv", "p2")):
            for j, ab in (("0", "a"), ("1", "b")):
                for dw, fl in (("depthwise_conv", "dw"), ("pointwise_conv", "pw")):
                    R += [
                        (P + rf"\.{mid}\.(\d+)\.{j}\.{dw}\.0", "conv",
                         F + rf"/{pn}_\2_{ab}/{fl}/conv"),
                        (P + rf"\.{mid}\.(\d+)\.{j}\.{dw}\.1", "bn",
                         F + rf"/{pn}_\2_{ab}/{fl}_bn/bn"),
                    ]
        # Residual: BasicBlock c1 + BottleNeck b{j} (pose_hg_ms_att.py:25-77)
        R += [
            (P + r"\.conv1\.conv\.0", "conv", F + r"/c1/c1/conv"),
            (P + r"\.conv1\.conv\.1", "bn", F + r"/c1/bn1/bn"),
            (P + r"\.conv1\.conv\.3", "conv", F + r"/c1/c2/conv"),
            (P + r"\.conv1\.conv\.4", "bn", F + r"/c1/bn2/bn"),
            (P + r"\.conv1\.skip_layer\.0", "conv", F + r"/c1/skip/conv"),
            (P + r"\.conv1\.skip_layer\.1", "bn", F + r"/c1/skip_bn/bn"),
        ]
        for k, fk in (("0", "c1"), ("1", "bn1"), ("3", "c2"), ("4", "bn2"),
                      ("6", "c3"), ("7", "bn3")):
            kind = "bn" if fk.startswith("bn") else "conv"
            tail = f"/{fk}/bn" if kind == "bn" else f"/{fk}/conv"
            R.append((P + rf"\.blocks\.(\d+)\.conv\.{k}", kind,
                      F + rf"/b\2" + tail))
    # features tail (pose_hg_ms_att.py:236-242)
    for k, fk in (("0", "c1"), ("1", "bn1"), ("3", "c2"), ("4", "bn2"),
                  ("6", "c3"), ("7", "bn3")):
        kind = "bn" if fk.startswith("bn") else "conv"
        tail = f"/{fk}/bn" if kind == "bn" else f"/{fk}/conv"
        R.append((rf"features\.0\.conv\.{k}", kind, r"feat_b" + tail))
    R += [
        (r"features\.1", "conv", r"feat_c/conv"),
        (r"features\.2", "bn", r"feat_bn/bn"),
        (r"outs", "conv", r"outs/conv"),
    ]
    return R


RULES["mynet"] = _mynet_rules()


def _mynet_stacked_rules() -> List[Rule]:
    """Gen-1 STACKED MultiScaleAttentionHourglass (reference
    models/pose_estimation/pose_hg_ms_att.py:189-265 — note: unrunnable as
    shipped, __init__ calls an undefined self.check_init): pelee stem,
    nstack recursive Hourglasses with MSAB at the top level and pre-act
    Residuals inside, merge heads, optional SimDR Linear heads."""
    TREE = r"((?:low\d|up\d)(?:\.(?:low\d|up\d))*)"
    # pre-act Residual Sequential indices (pose_hg_ms_att.py:27-50)
    RES = (("0", "bn1", "bn"), ("2", "c1", "conv"), ("3", "bn2", "bn"),
           ("5", "c2", "conv"), ("6", "bn3", "bn"), ("8", "c3", "conv"))

    def tree(m, tail):
        return f"hg{m.group(1)}/" + m.group(2).replace(".", "/") + "/" + tail

    R: List[Rule] = [
        (r"pre\.conv1\.0", "conv", r"pre_c1/conv"),
        (r"pre\.conv1\.1", "bn", r"pre_bn1/bn"),
        (r"pre\.conv1\.3", "conv", r"pre_c2/conv"),
        (r"pre\.conv1\.4", "bn", r"pre_bn2/bn"),
        (r"pre\.branch1\.0", "conv", r"pre_b1a/conv"),
        (r"pre\.branch1\.1", "bn", r"pre_b1a_bn/bn"),
        (r"pre\.branch1\.3", "conv", r"pre_b1b/conv"),
        (r"pre\.branch1\.4", "bn", r"pre_b1b_bn/bn"),
        (r"pre\.conv1x1\.0", "conv", r"pre_proj/conv"),
        (r"pre\.conv1x1\.1", "bn", r"pre_proj_bn/bn"),
    ]
    P = rf"hgs\.(\d+)\.{TREE}"
    # MSAB blocks (BRC conv1/conv2, DW ladders, pooled attention)
    R += [
        (P + r"\.conv(\d)\.conv", "conv", lambda m: tree(m, f"conv{m.group(3)}_conv/conv")),
        (P + r"\.conv(\d)\.bn", "bn", lambda m: tree(m, f"conv{m.group(3)}_bn/bn")),
        (P + r"\.att\.1", "bn", lambda m: tree(m, "att_bn/bn")),
        (P + r"\.att\.3", "conv", lambda m: tree(m, "att_conv/conv")),
        (P + r"\.att\.6", "linear", lambda m: tree(m, "att_fc")),
    ]
    for mid, pn in (("mid1_conv", "p1"), ("mid2_conv", "p2")):
        for j, ab in (("0", "a"), ("1", "b")):
            for dw, fl in (("depthwise_conv", "dw"), ("pointwise_conv", "pw")):
                R += [
                    (P + rf"\.{mid}\.(\d+)\.{j}\.{dw}\.0", "conv",
                     lambda m, pn=pn, ab=ab, fl=fl:
                     tree(m, f"{pn}_{m.group(3)}_{ab}/{fl}/conv")),
                    (P + rf"\.{mid}\.(\d+)\.{j}\.{dw}\.1", "bn",
                     lambda m, pn=pn, ab=ab, fl=fl:
                     tree(m, f"{pn}_{m.group(3)}_{ab}/{fl}_bn/bn")),
                ]
    # pre-act Residuals inside the recursion + skip projections
    for k, fk, kind in RES:
        R.append((P + rf"\.conv\.{k}", kind,
                  lambda m, fk=fk, kind=kind:
                  tree(m, f"{fk}/bn" if kind == "bn" else f"{fk}/conv")))
    R.append((P + r"\.skip_layer", "conv", lambda m: tree(m, "skip/conv")))
    # features / outs / merges / simdr heads
    for k, fk, kind in RES:
        R.append((rf"features\.(\d+)\.0\.conv\.{k}", kind,
                  rf"feat\1_res/{fk}/" + ("bn" if kind == "bn" else "conv")))
    R += [
        (r"features\.(\d+)\.0\.skip_layer", "conv", r"feat\1_res/skip/conv"),
        (r"features\.(\d+)\.1", "bn", r"feat\1_bn/bn"),
        (r"features\.(\d+)\.3", "conv", r"feat\1_conv/conv"),
        (r"outs\.(\d+)", "conv", r"out\1/conv"),
        (r"merge_features\.(\d+)", "conv", r"merge_feat\1/conv"),
        (r"merge_preds\.(\d+)", "conv", r"merge_pred\1/conv"),
        (r"pred_x", "linear", r"pred_x"),
        (r"pred_y", "linear", r"pred_y"),
    ]
    return R


RULES["mynet_stacked"] = _mynet_stacked_rules()


def _aug_rules(tp: str, fp: str) -> List[Rule]:
    """AugmentedConv (reference models/pose_estimation/AttentionHandNet):
    qkv/attn_out/conv_out convs + learnable relative-position embeddings."""
    return [
        (tp + r"\.qkv_conv", "conv", fp + r"/qkv/conv"),
        (tp + r"\.attn_out", "conv", fp + r"/attn_out/conv"),
        (tp + r"\.conv_out", "conv", fp + r"/conv_out/conv"),
        (tp + r"\.key_rel_w", "scalar", fp + r"/key_rel_w"),
        (tp + r"\.key_rel_h", "scalar", fp + r"/key_rel_h"),
    ]


def _atthandnet_rules() -> List[Rule]:
    """AttHandNet (reference models/pose_estimation/AttentionHandNet):
    dense ARB blocks (pw/dw/proj ConvModules + attention-augmented conv),
    BlurPool transitions (fixed blur filter buffer skipped), final aug block
    + coord head."""
    R: List[Rule] = [
        (r"dense(\d)\.arb\.(\d+)\.conv1\.0", "conv", r"dense\1/arb\2/pw/conv"),
        (r"dense(\d)\.arb\.(\d+)\.conv1\.1", "bn", r"dense\1/arb\2/pw_bn/bn"),
        (r"dense(\d)\.arb\.(\d+)\.conv1\.3", "conv", r"dense\1/arb\2/dw/conv"),
        (r"dense(\d)\.arb\.(\d+)\.conv1\.4", "bn", r"dense\1/arb\2/dw_bn/bn"),
        (r"dense(\d)\.arb\.(\d+)\.conv2\.0", "conv", r"dense\1/arb\2/proj/conv"),
        (r"dense(\d)\.arb\.(\d+)\.conv2\.1", "bn", r"dense\1/arb\2/proj_bn/bn"),
        (r"dense(\d)\.arb\.(\d+)\.attention_aug\.1", "bn",
         r"dense\1/arb\2/att/norm/bn"),
    ]
    R += _aug_rules(r"dense(\d)\.arb\.(\d+)\.attention_aug\.0",
                    r"dense\1/arb\2/att/aug")
    R += _aug_rules(r"aug_block\.0", r"aug_final/aug")
    R += [
        (r"aug_block\.1", "bn", r"aug_final/norm/bn"),
        (r"transition(\d)\.conv", "conv", r"transition\1/conv/conv"),
        (r"transition(\d)\.batch_normalization", "bn", r"transition\1/norm/bn"),
        # BlurPool's fixed binomial filter is a buffer, computed on the fly
        # in the flax model
        (r"transition(\d)\.activation", "skip", r""),
        (r"conv", "conv", r"head/conv"),
    ]
    return R


RULES["atthandnet"] = _atthandnet_rules()


def _hourglass_ablation_rules() -> List[Rule]:
    """hourglass_ablation (reference models/hourglass_ablation.py): the Gen-1
    single-stage hourglass with pluggable attention (ca/se/1x1/identity/cbam),
    optional MSRB replacement, and optional residual channel attention."""
    R: List[Rule] = [
        (r"pre\.conv1\.0", "conv", r"pre/c1/conv"),
        (r"pre\.conv1\.1", "bn", r"pre/bn1/bn"),
        (r"pre\.conv1\.3", "conv", r"pre/c2/conv"),
        (r"pre\.conv1\.4", "bn", r"pre/bn2/bn"),
        (r"pre\.branch1\.0", "conv", r"pre/b1a/conv"),
        (r"pre\.branch1\.1", "bn", r"pre/b1a_bn/bn"),
        (r"pre\.branch1\.3", "conv", r"pre/b1b/conv"),
        (r"pre\.branch1\.4", "bn", r"pre/b1b_bn/bn"),
        (r"pre\.conv1x1", "conv", r"pre/proj/conv"),
    ]
    for t, f in (("encoder", "enc"), ("decoder", "dec")):
        P = rf"hgs\.{t}\.(\d+)"
        F = rf"{f}\1"
        R += [
            # ME_att BRC convs
            (P + r"\.conv(\d)\.conv", "conv", F + r"/conv\2/conv/conv"),
            (P + r"\.conv(\d)\.bn", "bn", F + r"/conv\2/norm/bn"),
            # attention variants: ca/rca (att.1/.3/.6), se (att.2/.4),
            # 1x1 (att), cbam handled via CBAM rules below
            (P + r"\.att\.1", "bn", F + r"/att/bn/bn"),
            (P + r"\.att\.3", "conv", F + r"/att/conv/conv"),
            (P + r"\.att\.6", "linear", F + r"/att/fc"),
            # CBAM (reference attention.py:269-294)
            (P + r"\.att\.pre\.0", "conv", F + r"/att/c1/conv"),
            (P + r"\.att\.pre\.1", "bn", F + r"/att/bn1/bn"),
            (P + r"\.att\.pre\.3", "conv", F + r"/att/c2/conv"),
            (P + r"\.att\.pre\.4", "bn", F + r"/att/bn2/bn"),
            (P + r"\.att\.residual_conv", "conv", F + r"/att/res/conv"),
            (P + r"\.att\.ca\.sharedMLP\.0", "conv", F + r"/att/ca/mlp1/conv"),
            (P + r"\.att\.ca\.sharedMLP\.2", "conv", F + r"/att/ca/mlp2/conv"),
            (P + r"\.att\.sa\.conv", "conv", F + r"/att/sa/conv/conv"),
            (P + r"\.att\.2", "linear", F + r"/att_fc1"),
            (P + r"\.att\.4", "linear", F + r"/att_fc2"),
            (P + r"\.att", "conv", F + r"/att/conv"),
        ]
        for mid, pn in (("mid1_conv", "p1"), ("mid2_conv", "p2")):
            for j, ab in (("0", "a"), ("1", "b")):
                for dw, fl in (("depthwise_conv", "dw"),
                               ("pointwise_conv", "pw")):
                    R += [
                        (P + rf"\.{mid}\.(\d+)\.{j}\.{dw}\.0", "conv",
                         F + rf"/{pn}_\2_{ab}/{fl}/conv"),
                        (P + rf"\.{mid}\.(\d+)\.{j}\.{dw}\.1", "bn",
                         F + rf"/{pn}_\2_{ab}/{fl}_bn/bn"),
                    ]
        R += [
            (P + r"\.conv1\.conv\.0", "conv", F + r"/c1/c1/conv"),
            (P + r"\.conv1\.conv\.1", "bn", F + r"/c1/bn1/bn"),
            (P + r"\.conv1\.conv\.3", "conv", F + r"/c1/c2/conv"),
            (P + r"\.conv1\.conv\.4", "bn", F + r"/c1/bn2/bn"),
            (P + r"\.conv1\.skip_layer\.0", "conv", F + r"/c1/skip/conv"),
            (P + r"\.conv1\.skip_layer\.1", "bn", F + r"/c1/skip_bn/bn"),
        ]
        for k, fk in (("0", "c1"), ("1", "bn1"), ("3", "c2"), ("4", "bn2"),
                      ("6", "c3"), ("7", "bn3")):
            kind = "bn" if fk.startswith("bn") else "conv"
            tail = f"/{fk}/bn" if kind == "bn" else f"/{fk}/conv"
            R.append((P + rf"\.blocks\.(\d+)\.conv\.{k}", kind,
                      F + rf"/b\2" + tail))
    for k, fk in (("0", "c1"), ("1", "bn1"), ("3", "c2"), ("4", "bn2"),
                  ("6", "c3"), ("7", "bn3")):
        kind = "bn" if fk.startswith("bn") else "conv"
        tail = f"/{fk}/bn" if kind == "bn" else f"/{fk}/conv"
        R.append((rf"features\.0\.conv\.{k}", kind, r"feat_b" + tail))
    R += [
        (r"features\.1", "conv", r"feat_c/conv"),
        (r"features\.2", "bn", r"feat_bn/bn"),
        (r"outs", "conv", r"outs/conv"),
    ]
    return R


RULES["hourglass_ablation"] = _hourglass_ablation_rules()


def _chatt(tp: str, fp: str) -> List[Rule]:
    """ChannelAttension / SEBlock (liteHandNet/common.py:23-75)."""
    return [
        (tp + r"\.conv3x3\.conv", "conv", fp + r"/att/conv"),
        (tp + r"\.conv3x3\.bn", "bn", fp + r"/att_bn/bn"),
        (tp + r"\.conv1x1\.1", "conv", fp + r"/fc_down/conv"),
        (tp + r"\.conv1x1\.3", "conv", fp + r"/fc_up/conv"),
        (tp + r"\.down", "conv", fp + r"/down/conv"),
        (tp + r"\.up", "conv", fp + r"/up/conv"),
    ]


def _litehandnet_msrb_rules() -> List[Rule]:
    """LiteHandNet MSRB variant (reference
    models/pose_estimation/liteHandNet/litehourglass.py:13-237): shuffle
    stem, MSRB + RepBasicUnit maxpool hourglass, RBU neck."""

    def rbu(tp, fp):
        return (_repconv(tp + r"\.conv\.0", fp + r"/c1")
                + _repconv(tp + r"\.conv\.1", fp + r"/c2")
                + _chatt(tp + r"\.ca", fp + r"/ca"))

    def msrb(tp, fp):
        R = []
        for j in ("0", "1"):
            R += _repconv(tp + rf"\.branch1\.{j}", fp + rf"/b1_{j}")
            R += _repconv(tp + rf"\.branch2\.{j}", fp + rf"/b2_{j}")
            R += _chatt(tp + rf"\.ca\.{j}", fp + rf"/ca_{j}")
        return R + _repconv(tp + r"\.conv", fp + r"/proj")

    R: List[Rule] = []
    R += _repconv(r"stem\.conv1\.0", r"stem_c1")
    R += _repconv(r"stem\.conv1\.1", r"stem_c2")
    R += _repconv(r"stem\.branch1\.0", r"stem_b1a")
    R += _repconv(r"stem\.branch1\.1", r"stem_b1b")
    R += _repconv(r"stem\.branch1\.2", r"stem_b1c")
    R += _repconv(r"stem\.conv2\.0", r"stem_proj")
    R += rbu(r"stem\.conv2\.1", r"stem_u1")
    R += rbu(r"stem\.conv2\.2", r"stem_u2")
    for t, f in (("encoder", "enc"), ("decoder", "dec")):
        R += msrb(rf"backone\.{t}\.0\.0", rf"{f}0_msrb")
        R += rbu(rf"backone\.{t}\.0\.1", rf"{f}0_rbu")
        R += rbu(rf"backone\.{t}\.(\d+)\.0", rf"{f}\1_a")
        R += rbu(rf"backone\.{t}\.(\d+)\.1", rf"{f}\1_b")
    R += rbu(r"neck\.0", r"neck1")
    R += rbu(r"neck\.1", r"neck2")
    R.append((r"head", "conv", r"head/conv"))
    return R


RULES["litehandnet_msrb"] = _litehandnet_msrb_rules()


def _yolov6_rules() -> List[Rule]:
    """YOLOv6 (reference models/object_detection/yolov6/): EfficientRep
    backbone, Rep-PAN neck (SimConv reduce/downsample, ConvTranspose
    upsample), efficient decoupled head. torch modules: RepVGGBlock
    (common.py:135) -> flax RepBlock branches; SimConv/Conv (common.py:19-64,
    one conv+bn) -> flax RepConv main/main_bn; Transpose (common.py:85) ->
    nn.ConvTranspose."""

    def simconv(tp, fp):
        return [
            (tp + r"\.conv", "conv", fp + r"/main/conv"),
            (tp + r"\.bn", "bn", fp + r"/main_bn/bn"),
        ]

    def stage(tp, fp):
        return (_repblock(tp + r"\.conv1", fp + r"/conv1")
                + _repblock(tp + r"\.block\.(\d+)", fp + r"/blk\1"))

    R: List[Rule] = []
    R += _repblock(r"backbone\.stem", r"backbone/stem")
    for i in (2, 3, 4, 5):
        R += _repblock(rf"backbone\.ERBlock_{i}\.0", rf"backbone/er{i}_down")
        R += stage(rf"backbone\.ERBlock_{i}\.1", rf"backbone/er{i}_stage")
    R += simconv(r"backbone\.ERBlock_5\.2\.cv1", r"backbone/sppf/cv1")
    R += simconv(r"backbone\.ERBlock_5\.2\.cv2", r"backbone/sppf/cv2")
    R += simconv(r"neck\.reduce_layer0", r"neck/reduce0")
    R.append((r"neck\.upsample0\.upsample_transpose", "deconv", r"neck/up0"))
    R += simconv(r"neck\.reduce_layer1", r"neck/reduce1")
    R.append((r"neck\.upsample1\.upsample_transpose", "deconv", r"neck/up1"))
    R += stage(r"neck\.Rep_p4", r"neck/p4")
    R += stage(r"neck\.Rep_p3", r"neck/p3")
    R += stage(r"neck\.Rep_n3", r"neck/n3")
    R += stage(r"neck\.Rep_n4", r"neck/n4")
    R += simconv(r"neck\.downsample2", r"neck/down2")
    R += simconv(r"neck\.downsample1", r"neck/down1")
    R += simconv(r"detect\.stems\.(\d+)", r"head/stem\1")
    R += simconv(r"detect\.cls_convs\.(\d+)", r"head/cls_conv\1")
    R += simconv(r"detect\.reg_convs\.(\d+)", r"head/reg_conv\1")
    R.append((r"detect\.cls_preds\.(\d+)", "conv", r"head/cls_pred\1"))
    R.append((r"detect\.reg_preds\.(\d+)", "conv", r"head/reg_pred\1"))
    R.append((r"detect\.obj_preds\.(\d+)", "conv", r"head/obj_pred\1"))
    return R


RULES["yolov6"] = _yolov6_rules()
