"""Gen-1 evaluation helpers: golden parity with reference utils/evaluation.py
(loaded live; torchvision — absent from this rig — is stubbed with a faithful
torch greedy NMS so the reference module can run)."""

import sys
import types

import numpy as np
import pytest

from litehandnet_tpu.eval.ap import count_ap
from litehandnet_tpu.eval.legacy_eval import (
    cs_from_region_map,
    evaluate_ap,
    heatmap_pck,
    non_max_suppression,
)

from tests import ref_loader

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference absent"
)


def _load_ref_evaluation():
    torch = pytest.importorskip("torch")

    def _nms(boxes, scores, iou_threshold):
        """torchvision.ops.nms semantics: score-descending greedy, suppress
        IoU strictly greater than the threshold."""
        order = torch.argsort(scores, descending=True, stable=True)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        keep, suppressed = [], torch.zeros(len(order), dtype=torch.bool)
        for oi in order.tolist():
            if suppressed[oi]:
                continue
            keep.append(oi)
            ix1 = torch.maximum(boxes[oi, 0], boxes[:, 0])
            iy1 = torch.maximum(boxes[oi, 1], boxes[:, 1])
            ix2 = torch.minimum(boxes[oi, 2], boxes[:, 2])
            iy2 = torch.minimum(boxes[oi, 3], boxes[:, 3])
            inter = (ix2 - ix1).clamp(min=0) * (iy2 - iy1).clamp(min=0)
            iou = inter / (areas[oi] + areas - inter).clamp(min=1e-12)
            suppressed |= iou > iou_threshold
        return torch.tensor(keep, dtype=torch.long)

    if "torchvision" not in sys.modules or not hasattr(
        sys.modules.get("torchvision", None), "ops"
    ):
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=_nms)
        sys.modules["torchvision"] = tv
    else:
        sys.modules["torchvision"].ops = types.SimpleNamespace(nms=_nms)
    ref_loader.ensure_reference_importable()
    return ref_loader._load("utils/evaluation.py", "_ref_evaluation")


def test_heatmap_pck_parity(rng):
    torch = pytest.importorskip("torch")
    ref = _load_ref_evaluation()
    B, K, H, W = 4, 21, 64, 64
    pred = rng.uniform(0, 1, (B, K, H, W)).astype(np.float32)
    gt = rng.uniform(0, 1, (B, K, H, W)).astype(np.float32)
    # some channels all-nonpositive to exercise the (maxval <= 0) zeroing
    pred[0, 3] = -pred[0, 3]
    gt[1, 5] = 0.0
    bbox = rng.uniform(40, 200, (B, 2, 4)).astype(np.float32)
    tw = (rng.uniform(size=(B, K, 1)) > 0.25).astype(np.float32)

    want = ref.evaluate_pck(
        torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(bbox), image_size=256,
        target_weight=torch.from_numpy(tw), thr=0.2,
    )
    got = heatmap_pck(
        pred.transpose(0, 2, 3, 1), gt.transpose(0, 2, 3, 1), bbox,
        image_size=256, target_weight=tw, thr=0.2,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # default weights path
    want = ref.evaluate_pck(
        torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(bbox), image_size=256, thr=0.3,
    )
    got = heatmap_pck(
        pred.transpose(0, 2, 3, 1), gt.transpose(0, 2, 3, 1), bbox,
        image_size=256, thr=0.3,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cs_from_region_map_parity(rng):
    torch = pytest.importorskip("torch")
    ref = _load_ref_evaluation()
    B, H, W, k = 2, 48, 48, 8
    region = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)

    want = ref.cs_from_region_map(
        torch.from_numpy(region), image_size=192, k=k, thr=0.9
    ).numpy()
    got = np.asarray(cs_from_region_map(
        region.transpose(0, 2, 3, 1), image_size=192.0, k=k, thr=0.9
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nms_and_evaluate_ap_parity(rng):
    torch = pytest.importorskip("torch")
    ref = _load_ref_evaluation()

    cands = rng.uniform(0, 1, (3, 12, 5)).astype(np.float32)
    cands[..., :2] = rng.uniform(20, 200, (3, 12, 2))
    cands[..., 2:4] = rng.uniform(5, 120, (3, 12, 2))
    cands[0, 3, 2] = 1.0      # too-small width filtered by the size gate
    cands[1, :, 4] = 0.05     # image with nothing above conf -> None

    want = ref.non_max_suppression(
        torch.from_numpy(cands.copy()), iou_threshold=0.6,
        conf_threshold=0.1, max_num=4,
    )
    got = non_max_suppression(cands, iou_threshold=0.6, conf_threshold=0.1,
                              max_num=4)
    assert [g is None for g in got] == [w is None for w in want]
    for g, w in zip(got, want):
        if g is not None:
            np.testing.assert_allclose(np.array(g), np.array(w), rtol=1e-5)

    # full region-maps -> AP flow, reference pcfg thresholds on both sides
    B, H, W = 2, 48, 48
    region = np.zeros((B, 3, H, W), np.float32)
    gt_boxes = []
    for b in range(B):
        boxes = []
        for cx, cy, w, h in ((60, 60, 70, 80), (130, 140, 60, 50)):
            region[b, 0, cy // 4, cx // 4] = 0.95 - 0.1 * b
            region[b, 1, cy // 4 - 4:cy // 4 + 4, cx // 4 - 4:cx // 4 + 4] = (
                w / 4.0  # stored so that window-mean * stride ~ w
            )
            region[b, 2, cy // 4 - 4:cy // 4 + 4, cx // 4 - 4:cx // 4 + 4] = (
                h / 4.0
            )
            boxes.append([cx, cy, w, h])
        gt_boxes.append(boxes)

    ref_ap50, ref_ap, ref_pred = ref.evaluate_ap(
        torch.from_numpy(region), [list(b) for b in gt_boxes], 192
    )
    got_ap50, got_ap, got_pred = evaluate_ap(
        region.transpose(0, 2, 3, 1), [list(b) for b in gt_boxes], 192
    )
    np.testing.assert_allclose(got_ap50, ref_ap50, rtol=1e-6)
    np.testing.assert_allclose(got_ap, ref_ap, rtol=1e-6)
    assert [g is None for g in got_pred] == [p is None for p in ref_pred]


def test_count_ap_parity(rng):
    torch = pytest.importorskip("torch")
    ref = _load_ref_evaluation()

    n_img = 5
    gt, preds = [], []
    for _ in range(n_img):
        # >= 1 gt always: the reference crashes on an image that has
        # predictions but no gt boxes (bbox_iou on an empty list,
        # bbox_metric.py:99 — see PARITY.md); ours scores those preds as
        # misses, which is only testable one-sided
        n_gt = rng.randint(1, 3)
        gt.append([
            [float(v) for v in rng.uniform(30, 200, 2)]
            + [float(v) for v in rng.uniform(20, 80, 2)]
            for _ in range(n_gt)
        ])
        n_pred = rng.randint(0, 4)
        if n_pred == 0:
            preds.append(None)
            continue
        rows = []
        for g in (gt[-1] + [None] * n_pred)[:n_pred]:
            if g is not None and rng.uniform() > 0.3:
                # jittered copy of a gt box
                rows.append([
                    g[0] + rng.uniform(-5, 5), g[1] + rng.uniform(-5, 5),
                    g[2] * rng.uniform(0.8, 1.2), g[3] * rng.uniform(0.8, 1.2),
                    float(rng.uniform(0.3, 1.0)),
                ])
            else:
                rows.append(
                    [float(v) for v in rng.uniform(30, 200, 2)]
                    + [float(v) for v in rng.uniform(20, 80, 2)]
                    + [float(rng.uniform(0.3, 1.0))]
                )
        preds.append(rows)
    if all(p is None for p in preds):
        preds[0] = [[50.0, 50.0, 40.0, 40.0, 0.9]]
    if all(len(g) == 0 for g in gt):
        gt[0] = [[50.0, 50.0, 40.0, 40.0]]

    ref_ap50, ref_ap = ref.count_ap(
        [None if p is None else [list(r) for r in p] for p in preds],
        [list(map(list, g)) for g in gt],
    )
    got_ap50, got_ap = count_ap(
        [None if p is None else np.array(p, np.float32) for p in preds], gt
    )
    np.testing.assert_allclose(got_ap50, ref_ap50, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(got_ap, ref_ap, rtol=1e-6, atol=1e-9)


def test_evaluate_ap_gt_roundtrip_with_gen1_targets():
    """Regression: the Gen-1 trainer supervises region maps as ratios over
    the Gen-1 +-3*sigma patch (ops/encode.region_map patch="gen1"), while
    evaluate_ap decodes the Gen-1 scale (gamma = w*hm/img, window MEAN,
    scaled by the feature stride). GT-encoded maps through the scale
    bridge used by evaluate_multihand_pck (wh channels * heatmap_size)
    must score a perfect AP50 — previously the 5x5 ratio patches decoded
    to ~0.2 px boxes (wrong scale) diluted 25/169 (wrong extent) and AP
    was structurally 0."""
    import jax.numpy as jnp

    from litehandnet_tpu.ops.encode import region_map

    size, hm = 64, 32
    bboxes = np.array([[8.0, 8.0, 48.0, 48.0], [20.0, 12.0, 24.0, 40.0]],
                      np.float32)
    maps = np.stack([
        np.asarray(region_map(jnp.asarray(b), (size, size), (hm, hm), 2.0,
                              patch="gen1"))
        for b in bboxes
    ])                                           # [B, hm, hm, 3] ratio wh
    bridged = maps.copy()
    bridged[..., 1:] *= np.array([hm, hm], np.float32)
    gt = [
        [[b[0] + b[2] / 2, b[1] + b[3] / 2, b[2], b[3]]] for b in bboxes
    ]
    ap50, ap, preds = evaluate_ap(bridged, gt, image_size=size)
    assert ap50 == 1.0, (ap50, preds)
    # decoded wh is a clipped-window mean: near-exact for interior boxes
    for b, p in zip(bboxes, preds):
        assert p, p
        np.testing.assert_allclose(p[0][2:4], b[2:4], rtol=0.25)
    # the unbridged ratio-scale maps must NOT silently work
    ap50_raw, _, _ = evaluate_ap(maps, gt, image_size=size)
    assert ap50_raw == 0.0


def test_region_map_gen1_patch_parity():
    """region_map(patch="gen1") wh channels match the reference Gen-1
    encoder get_hw_region_map (data/handset/dataset_function.py:181-209)
    exactly, up to the documented value-scale convention (ours stores
    w/img ratios; the reference stores w*hm/img)."""
    import jax.numpy as jnp

    from litehandnet_tpu.ops.encode import region_map

    ref_loader.ensure_reference_importable()
    df = ref_loader._load("data/handset/dataset_function.py", "_ref_df")

    size, hm, sigma = 64, 32, 2.0
    rng_ = np.random.RandomState(3)
    for _ in range(8):
        bbox = np.array([
            rng_.uniform(-4, 40), rng_.uniform(-4, 40),
            rng_.uniform(4, 40), rng_.uniform(4, 40),
        ], np.float32)
        got = np.asarray(region_map(
            jnp.asarray(bbox), (size, size), (hm, hm), sigma, patch="gen1"
        ))
        c = bbox[:2] + bbox[2:] / 2.0
        want = df.get_hw_region_map(c, bbox[2:], size, hm, sigma)
        np.testing.assert_allclose(
            got[..., 1] * hm, want[0], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            got[..., 2] * hm, want[1], rtol=1e-5, atol=1e-6
        )


def test_cs_from_region_map_nondefault_sigma():
    """heatmap_sigma is static in the jit: non-default values must compile
    (regression: int(traced sigma) raised TracerIntegerConversionError)."""
    import jax.numpy as jnp

    maps = jnp.zeros((1, 16, 16, 3)).at[0, 8, 8, 0].set(1.0)
    out = np.asarray(cs_from_region_map(maps, 64.0, 5, 0.5, heatmap_sigma=3))
    assert out.shape == (1, 5, 5)
    assert out[0, 0, 4] == 1.0
