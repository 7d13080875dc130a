"""MPII mat-file PCKh evaluation path (reference topdown_mpii_dataset.py:
158-258) — exercised end-to-end with a synthetic mpii_gt_val.mat.

Round-1 verdict flagged this path as never executed (no real .mat on disk);
scipy can author one with the exact structure DHRNet's valid.mat uses:
dataset_joints [1,16] names, jnt_missing [16,N], pos_gt_src [16,2,N],
headboxes_src [2,2,N]. GT-as-prediction must yield PCKh 100; a controlled
perturbation yields hand-countable PCKh values.
"""

import json

import numpy as np
import pytest

scipy_io = pytest.importorskip("scipy.io")

# MPII joint order used by the official eval mat
MPII_NAMES = [
    "rank", "rkne", "rhip", "lhip", "lkne", "lank", "pelvis", "thorax",
    "upperneck", "head", "rwri", "relb", "rsho", "lsho", "lelb", "lwri",
]
N, K = 8, 16


def _write_fixture(tmp_path, rng):
    pos_gt = rng.uniform(100, 400, (K, 2, N)).astype(np.float64)
    # head boxes with diagonal 100 -> headsize = 60 after SC_BIAS 0.6
    hb0 = rng.uniform(50, 80, (2, N))
    headboxes = np.stack([hb0, hb0 + np.float64([[60.0], [80.0]])])  # [2,2,N]
    jnt_missing = np.zeros((K, N), np.float64)
    jnt_missing[5, 0] = 1  # one missing joint: lank of sample 0
    mat = dict(
        dataset_joints=np.array([MPII_NAMES], dtype=object),
        jnt_missing=jnt_missing,
        pos_gt_src=pos_gt,
        headboxes_src=headboxes,
    )
    scipy_io.savemat(tmp_path / "mpii_gt_val.mat", mat)

    anno = []
    for i in range(N):
        anno.append(dict(
            image=f"{i:09d}.jpg",
            center=[256.0, 256.0],
            scale=1.5,
            joints=(pos_gt[:, :, i]).tolist(),
            joints_vis=(1 - jnt_missing[:, i]).tolist(),
        ))
    ann_file = tmp_path / "mpii_val.json"
    ann_file.write_text(json.dumps(anno))
    return ann_file, pos_gt, jnt_missing


def _evaluate(ann_file, preds_matlab):
    """Run TopDownMpiiDataset.evaluate with predictions given in MATLAB
    1-based coords (the dataset adds +1 before comparing to pos_gt_src)."""
    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.data import build_dataset

    cfg = config_from_dict(dict(
        MODEL=dict(name="resnet", num_layers=18),
        DATASET=dict(
            name="mpii", num_joints=16, image_size=[256, 256],
            heatmap_size=[64, 64],
            test=dict(ann_file=str(ann_file), img_prefix=""),
        ),
        PIPELINE=dict(sigma=2, encoding="MSRA"),
        EVAL=dict(metric=["PCKh"]),
    ))
    ds = build_dataset(cfg, "test")
    results = [dict(
        preds=preds_matlab.transpose(2, 0, 1) - 1.0,  # [N,K,2] 0-based
        bbox_ids=list(range(N)),
    )]
    return ds.evaluate(results, metric="PCKh")


def test_gt_roundtrip_pckh_100(tmp_path):
    ann_file, pos_gt, _ = _write_fixture(tmp_path, np.random.RandomState(0))
    stats = _evaluate(ann_file, pos_gt.copy())
    assert stats["PCKh"] == pytest.approx(100.0)
    assert stats["Head"] == pytest.approx(100.0)
    assert stats["Ankle"] == pytest.approx(100.0)
    assert stats["PCKh@0.1"] == pytest.approx(100.0)


def test_perturbed_pckh_counts(tmp_path):
    """Push exactly 2 of 8 samples' wrists beyond 0.5*headsize: wrist PCKh
    drops to 75, all other joints stay at 100."""
    ann_file, pos_gt, jnt_missing = _write_fixture(
        tmp_path, np.random.RandomState(1)
    )
    headsize = np.hypot(60.0, 80.0) * 0.6  # = 60
    preds = pos_gt.copy()
    lwri, rwri = MPII_NAMES.index("lwri"), MPII_NAMES.index("rwri")
    for s in (2, 5):
        preds[lwri, 0, s] += 0.6 * headsize
        preds[rwri, 0, s] += 0.6 * headsize
    # nudge one ankle just UNDER threshold: must still count as correct
    preds[MPII_NAMES.index("rank"), 0, 3] += 0.45 * headsize
    stats = _evaluate(ann_file, preds)
    assert stats["Wrist"] == pytest.approx(75.0)
    assert stats["Ankle"] == pytest.approx(100.0)
    assert stats["Head"] == pytest.approx(100.0)
    # overall: visible-joint-weighted mean over non-masked joints
    # (pelvis/thorax excluded); lank sample 0 missing -> 13*8+7 visible of
    # the 14 scoreable joints minus... compute directly:
    vis = 1 - jnt_missing
    mask = np.ones(K, bool)
    mask[6:8] = False
    correct = vis.copy()
    correct[lwri, [2, 5]] = 0
    correct[rwri, [2, 5]] = 0
    expected = 100.0 * correct[mask].sum() / vis[mask].sum()
    assert stats["PCKh"] == pytest.approx(expected)


def test_pckh_matches_reference_executed_live(tmp_path):
    """Golden: the REFERENCE TopDownMpiiDataset.evaluate
    (topdown_mpii_dataset.py:126-250) runs live on the same fixture mat
    and noisy predictions; every name_value entry must match ours.

    The reference class is instantiated without __init__ (its loader
    wants images on disk); evaluate() touches only self.ann_file and
    self._sort_and_unique_bboxes, both provided."""
    from tests import ref_loader

    if not ref_loader.reference_available():
        pytest.skip("reference absent")
    # the site-packages `datasets` (HF) shadows the reference's namespace
    # dir; stub just the two parent imports the class STATEMENT needs —
    # evaluate() itself only uses the module's own numpy/scipy imports
    import sys
    import types

    base = types.ModuleType("datasets.base_dataset")
    base.Kpt2dDataset = type("Kpt2dDataset", (), {})
    dcfg = types.ModuleType("datasets.dataset_info.dataset_configs")
    dcfg.mpii_info = {}
    saved = {}
    for name, mod in [("datasets.base_dataset", base),
                      ("datasets.dataset_info.dataset_configs", dcfg)]:
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        ref_mod = ref_loader._load(
            "datasets/datasets/body/topdown_mpii_dataset.py",
            "_ref_topdown_mpii")
    finally:
        for name, old in saved.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old
    RefCls = ref_mod.TopDownMpiiDataset

    rng = np.random.RandomState(7)
    ann_file, pos_gt, _ = _write_fixture(tmp_path, rng)
    # noise spanning the 0.5*headsize threshold -> non-trivial PCKh curve
    preds = pos_gt + rng.uniform(-45, 45, pos_gt.shape)

    stub = object.__new__(RefCls)
    stub.ann_file = str(ann_file)
    results = [dict(
        preds=preds.transpose(2, 0, 1) - 1.0, bbox_ids=list(range(N)),
    )]
    want = RefCls.evaluate(stub, results, metric="PCKh")
    got = _evaluate(ann_file, preds)
    assert set(got) == set(want)
    for key, val in want.items():
        assert got[key] == pytest.approx(float(val), abs=1e-9), key
    # the noise must actually have produced a mid-range score
    assert 5.0 < got["PCKh"] < 95.0


def test_mpii_action_dataset_shares_eval(tmp_path):
    """The action variant reuses the same mat-eval machinery."""
    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.data import build_dataset

    ann_file, pos_gt, _ = _write_fixture(tmp_path, np.random.RandomState(2))
    cfg = config_from_dict(dict(
        MODEL=dict(name="resnet", num_layers=18),
        DATASET=dict(
            name="mpii_action", num_joints=16, image_size=[256, 256],
            heatmap_size=[64, 64],
            test=dict(ann_file=str(ann_file), img_prefix=""),
        ),
        PIPELINE=dict(sigma=2, encoding="MSRA"),
        EVAL=dict(metric=["PCKh"]),
    ))
    ds = build_dataset(cfg, "test")
    results = [dict(
        preds=pos_gt.transpose(2, 0, 1) - 1.0, bbox_ids=list(range(N)),
    )]
    stats = ds.evaluate(results, metric="PCKh")
    assert stats["PCKh"] == pytest.approx(100.0)
