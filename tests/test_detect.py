"""Detection stack: region-map bbox decode, fixed-size NMS, AP, ResultParser
multi-hand pipeline with cycle detection."""

import numpy as np
import pytest

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.eval.ap import count_ap
from litehandnet_tpu.eval.result_parser import ResultParser
from litehandnet_tpu.ops import detect as D
from litehandnet_tpu.ops.encode import msra_heatmaps, region_map

from tests import ref_loader


def _cfg(img=256, hm=64):
    return config_from_dict(
        dict(
            DATASET=dict(num_joints=21, image_size=[img, img], heatmap_size=[hm, hm]),
            PIPELINE=dict(unbiased_encoding=True, simdr_split_ratio=2),
        )
    )


def _synthetic_scene(rng, img=256, hm=64, hands=((60, 70, 80, 90), (170, 180, 70, 60))):
    """Region maps + keypoint heatmaps for a 2-hand scene."""
    region = np.zeros((hm, hm, 3), np.float32)
    kpt_hm = np.zeros((hm, hm, 21), np.float32)
    gt_boxes = []
    gt_kpts = np.zeros((len(hands), 21, 3), np.float32)
    for i, (cx, cy, w, h) in enumerate(hands):
        bbox = np.array([cx - w / 2, cy - h / 2, w, h], np.float32)
        region += np.asarray(
            region_map(bbox, (img, img), (hm, hm), sigma=2.0)
        )
        joints = np.stack(
            [
                rng.uniform(cx - w * 0.3, cx + w * 0.3, 21),
                rng.uniform(cy - h * 0.3, cy + h * 0.3, 21),
            ],
            axis=1,
        ).astype(np.float32)
        hm_i, _ = msra_heatmaps(
            joints, np.ones(21), (img, img), (hm, hm), 2.0, unbiased=True
        )
        kpt_hm = np.maximum(kpt_hm, np.asarray(hm_i))
        gt_boxes.append([cx, cy, w, h])
        gt_kpts[i, :, :2] = joints
        gt_kpts[i, :, 2] = 1.0
    return region, kpt_hm, np.array(gt_boxes, np.float32), gt_kpts


def test_heatmap_nms_keeps_peaks():
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 5, 5, 0] = 1.0
    hm[0, 5, 6, 0] = 0.8  # neighbor suppressed
    hm[0, 12, 12, 0] = 0.9
    out = np.asarray(D.heatmap_nms(hm, kernel=3))
    assert out[0, 5, 5, 0] == 1.0
    assert out[0, 5, 6, 0] == 0.0
    assert out[0, 12, 12, 0] == 0.9


def test_bbox_iou_parity_with_reference(rng):
    if not ref_loader.reference_available():
        pytest.skip("reference absent")
    torch = pytest.importorskip("torch")
    import sys, types
    # bbox_metric imports torchvision at module level but bbox_iou never
    # touches it; stub it out.
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    ref = ref_loader._load("utils/bbox_metric.py", "_ref_bbox_metric")
    box1 = rng.uniform(10, 100, 4).astype(np.float32)
    boxes2 = rng.uniform(10, 100, size=(6, 4)).astype(np.float32)
    for kw_ours, kw_ref in [
        (dict(), dict(GIoU=False, DIoU=False, CIoU=False)),
        (dict(giou=True), dict(GIoU=True)),
        (dict(diou=True), dict(DIoU=True)),
        (dict(ciou=True), dict(CIoU=True)),
    ]:
        want = ref.bbox_iou(
            torch.from_numpy(box1), torch.from_numpy(boxes2),
            x1y1x2y2=False, **kw_ref,
        ).numpy()
        got = np.asarray(D.bbox_iou(box1, boxes2, xyxy=False, **kw_ours))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_region_decode_and_nms(rng):
    region, _, gt_boxes, _ = _synthetic_scene(rng)
    parser = ResultParser(_cfg(), cd_enabled=False)
    boxes = parser.get_pred_bbox(region[None])[0]  # [M, 5]
    valid = boxes[boxes[:, 4] > 0]
    assert len(valid) == 2, boxes
    # match each GT box center within a few pixels, size within 25%
    for gt in gt_boxes:
        d = np.linalg.norm(valid[:, :2] - gt[:2], axis=1)
        j = d.argmin()
        assert d[j] < 8.0, (valid, gt)
        assert np.abs(valid[j, 2:4] - gt[2:]).max() / gt[2:].max() < 0.25


def test_count_ap():
    gt = [[[50, 50, 40, 40]], [[100, 100, 30, 30]]]
    perfect = [
        np.array([[50, 50, 40, 40, 0.9]], np.float32),
        np.array([[100, 100, 30, 30, 0.8]], np.float32),
    ]
    ap50, ap = count_ap(perfect, gt)
    assert ap50 == 1.0 and ap == 1.0
    assert count_ap([None, None], gt) == (0.0, 0.0)
    # one hit one miss
    mixed = [
        np.array([[50, 50, 40, 40, 0.9]], np.float32),
        np.array([[0, 0, 10, 10, 0.8]], np.float32),
    ]
    ap50, _ = count_ap(mixed, gt, iou_threshold=0.5)
    assert 0.4 < ap50 <= 0.5


def test_result_parser_end_to_end(rng):
    region, kpt_hm, gt_boxes, gt_kpts = _synthetic_scene(rng)
    parser = ResultParser(_cfg(), cd_enabled=False)
    boxes = parser.get_pred_bbox(region[None])
    kpts = parser.get_group_keypoints(None, kpt_hm[None], boxes)
    assert kpts.shape == (1, parser.max_num_bbox, 21, 3)
    M = gt_kpts.shape[0]
    padded_gt = np.zeros((1, parser.max_num_bbox, 21, 3), np.float32)
    padded_gt[0, :M] = gt_kpts
    pck = parser.evaluate_pck(kpts, padded_gt, gt_boxes[None])
    assert pck > 0.9, pck
    ap50, ap = parser.evaluate_ap(list(np.asarray(boxes)), [gt_boxes.tolist()])
    assert ap50 == 1.0, (ap50, ap)


def test_cycle_detection_reinfers_small_hands(rng):
    """A small hand (area ratio < 0.1) must trigger the secondary pass."""
    img = 256
    region, kpt_hm, gt_boxes, gt_kpts = _synthetic_scene(
        rng, hands=((60, 70, 30, 30), (180, 180, 120, 120))
    )
    calls = []

    def fake_model(crops):
        calls.append(crops.shape)
        # return GT heatmap crops are hard to fake exactly; return the full
        # scene heatmap resized is sufficient to exercise the plumbing
        n = crops.shape[0]
        return np.tile(kpt_hm[None, :32, :32, :], (n, 1, 1, 1))

    parser = ResultParser(_cfg(), model_fn=fake_model, cd_enabled=True)
    boxes = parser.get_pred_bbox(region[None])
    images = np.zeros((1, img, img, 3), np.float32)
    kpts = parser.get_group_keypoints(images, kpt_hm[None], boxes)
    assert calls, "cycle detection never invoked the secondary model"
    assert kpts.shape[2:] == (21, 3)


def test_multihand_pck_parity_with_reference(rng):
    """evaluate_pck must match the reference bit-for-bit, including its
    quirks: centers sum ALL joint coords but divide by the VISIBLE count,
    and the PCK threshold normalizes by max(cx, cy) of the matched gt box
    (result_parser.py:356-399 passes bbox[min_idx, :2] where its comment
    says w,h)."""
    if not ref_loader.reference_available():
        pytest.skip("reference absent")
    torch = pytest.importorskip("torch")
    import sys, types

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    ref_loader.ensure_reference_importable()
    ref = ref_loader._load("utils/result_parser.py", "_ref_result_parser")

    B, M, K = 3, 4, 21
    pred = rng.uniform(0, 200, size=(B, M, K, 3)).astype(np.float32)
    gt = rng.uniform(0, 200, size=(B, M, K, 3)).astype(np.float32)
    # realistic visibility: some joints invisible, one hand slot empty
    pred[..., 2] = (rng.uniform(size=(B, M, K)) > 0.2).astype(np.float32)
    gt[..., 2] = (rng.uniform(size=(B, M, K)) > 0.2).astype(np.float32)
    pred[1, 3, :, 2] = 0.0
    boxes = rng.uniform(20, 220, size=(B, M, 4)).astype(np.float32)

    # the reference method only needs self-free tensor math; call it unbound
    ref_pck = ref.ResultParser.evaluate_pck(
        None, torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(boxes),
    )

    cfg = config_from_dict(dict(
        MODEL=dict(name="mynet_stacked"),
        DATASET=dict(num_joints=K, image_size=[256, 256],
                     heatmap_size=[64, 64]),
    ))
    ours = ResultParser(cfg, cd_enabled=False).evaluate_pck(pred, gt, boxes)
    np.testing.assert_allclose(ours, ref_pck, rtol=1e-6)
