"""Value fidelity of the config surface against the reference, loaded live.

Two surfaces:
* ``pcfg`` — the global post-processing hyper-parameters
  (reference config/__init__.py:4-27); ours renames three keys but must
  ship the same values.
* every experiment config file under reference ``config/`` — our
  template-generated mirror of the same relative path must agree on every
  behavioral knob (dataset paths and host-specific launcher fields are
  exempt, see SKIP).
"""

import glob
import os.path as osp
import types

import pytest

from litehandnet_tpu.config import get_config, pcfg

from tests import ref_loader

REF_ROOT = "/root/reference"
REF_CFG = osp.join(REF_ROOT, "config")

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference absent"
)

# (section, key) pairs deliberately not mirrored: dataset paths follow this
# repo's canonical layout; launcher/host fields are CUDA-rig-specific.
SKIP = {
    ("DATASET", "train"), ("DATASET", "val"), ("DATASET", "test"),
    ("TRAIN", "CUDA_VISIBLE_DEVICES"), ("TRAIN", "workers"),
    ("TRAIN", "pin_memory"), ("TRAIN", "distributed"),
    ("TRAIN", "find_unused_parameters"),
    ("CHECKPOINT", "save_root"),
}

# reference key -> our key (renames documented at config/__init__.py::pcfg)
PCFG_RENAMES = {
    "blue_kernel": "dark_kernel",
    "cd_iou": "cycle_detection_diou",
    "cd_ratio": "cycle_detection_area_ratio",
}


def _ref_pcfg():
    """The reference's shipped pcfg dict, exec'd live. The `import addict`
    line is stripped and a namespace-local stand-in injected instead of
    registering anything in sys.modules (a sys.modules stub with
    Dict=dict would leak into ref_loader's dot-dict stub and break every
    later reference-model test)."""
    src = open(osp.join(REF_CFG, "__init__.py")).read()
    src = "\n".join(
        ln for ln in src.splitlines() if not ln.startswith("import addict")
    )
    ns = {"addict": types.SimpleNamespace(Dict=dict)}
    exec(compile(src, "ref_config_init", "exec"), ns)
    return ns["pcfg"]


def test_pcfg_values_match_reference():
    ref = _ref_pcfg()
    for key, want in ref.items():
        if key in ("nms_stride", "nms_padding"):
            continue  # ours derives stride=1 / padding=kernel//2, below
        ours_key = PCFG_RENAMES.get(key, key)
        assert ours_key in pcfg, (key, ours_key)
        assert pcfg[ours_key] == want, (key, pcfg[ours_key], want)
    # max-pool NMS geometry: ours hardcodes stride 1 and padding kernel//2,
    # which must equal the reference's explicit knobs at shipped values
    assert ref["nms_stride"] == 1
    assert ref["nms_padding"] == pcfg.nms_kernel // 2


def _norm(v):
    if isinstance(v, tuple):
        v = list(v)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def _diff(section, ref_d, our_d, out, prefix=""):
    for k, rv in ref_d.items():
        if (section, k) in SKIP:
            continue
        if k not in our_d:
            out.append(f"{section}.{prefix}{k}: MISSING (ref={rv!r})")
            continue
        ov = our_d[k]
        if isinstance(rv, dict) and isinstance(ov, dict):
            _diff(section, rv, ov, out, prefix=f"{prefix}{k}.")
            continue
        if _norm(rv) != _norm(ov):
            out.append(f"{section}.{prefix}{k}: ref={rv!r} ours={ov!r}")


def _ref_experiment_files():
    files = sorted(glob.glob(osp.join(REF_CFG, "**", "*.py"), recursive=True))
    out = []
    for f in files:
        if f.endswith("__init__.py"):
            continue
        rel = osp.relpath(f, REF_CFG)[:-3]
        # 'srhandnet/_5_onehand10k_256x256_dark copy.py': the space makes it
        # unimportable as a module in BOTH frameworks (the reference's
        # get_config builds `from config.srhandnet.... copy import _get_cfg`)
        # — a stray editor duplicate, mirrored by absence
        if " " in rel:
            continue
        out.append(rel)
    return out


@pytest.mark.parametrize("rel", _ref_experiment_files())
def test_experiment_config_matches_reference(rel):
    path = osp.join(REF_CFG, rel + ".py")
    ns = {}
    exec(compile(open(path).read(), path, "exec"), ns)
    ref_cfg = ns["cfg"]
    # the reference loader's own post-rule (config/__init__.py:33-36),
    # since get_config on our side applies the same rule
    if ref_cfg.get("MODEL", {}).get("pred_bbox", False):
        ref_cfg["PIPELINE"]["rot_prob"] = 0
    ours = get_config(rel)

    out = []
    for section in ("MODEL", "DATASET", "PIPELINE", "CHECKPOINT", "EVAL",
                    "TRAIN", "OPTIMIZER", "LOSS"):
        if section not in ref_cfg:
            continue
        assert section in ours, (rel, section)
        _diff(section, ref_cfg[section], ours[section], out)
    if "ID" in ref_cfg:
        if _norm(ref_cfg["ID"]) != _norm(ours.get("ID")):
            out.append(f"ID: ref={ref_cfg['ID']!r} ours={ours.get('ID')!r}")
    assert not out, f"{rel}:\n" + "\n".join(out)
