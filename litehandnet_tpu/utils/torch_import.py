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

    def norm(path):
        return tuple(str(p.key) for p in path if hasattr(p, "key"))

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
        leaves.append(np.asarray(src, np.asarray(leaf).dtype))
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
