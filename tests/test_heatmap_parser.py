"""Bottom-up HeatmapParser: tag grouping recovers per-hand keypoints."""

import numpy as np

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.eval.heatmap_parser import HeatmapParser, HeatmapParserSH
from litehandnet_tpu.ops.encode import msra_heatmaps, region_map


def _cfg(img=256, hm=64):
    return config_from_dict(
        dict(DATASET=dict(num_joints=21, image_size=[img, img],
                          heatmap_size=[hm, hm]))
    )


def test_bottom_up_parse(rng):
    img, hm = 256, 64
    hands = ((60, 70, 90, 90), (180, 180, 80, 80))
    center = np.zeros((hm, hm, 1), np.float32)
    size_m = np.zeros((hm, hm, 2), np.float32)
    joint_hm = np.zeros((hm, hm, 21), np.float32)
    tag = np.zeros((hm, hm, 1), np.float32)
    joints_all = []
    for tag_val, (cx, cy, w, h) in zip((1.0, 5.0), hands):
        bbox = np.array([cx - w / 2, cy - h / 2, w, h], np.float32)
        rm = np.asarray(region_map(bbox, (img, img), (hm, hm), 2.0))
        center[..., 0] = np.maximum(center[..., 0], rm[..., 0])
        size_m = np.maximum(size_m, rm[..., 1:])
        joints = np.stack([
            rng.uniform(cx - w * 0.3, cx + w * 0.3, 21),
            rng.uniform(cy - h * 0.3, cy + h * 0.3, 21),
        ], axis=1).astype(np.float32)
        joints_all.append(joints)
        hm_i, _ = msra_heatmaps(joints, np.ones(21), (img, img), (hm, hm),
                                2.0, unbiased=True)
        joint_hm = np.maximum(joint_hm, np.asarray(hm_i))
        # constant tag inside the hand's region
        ys, xs = np.mgrid[0:hm, 0:hm]
        inside = (
            (np.abs(xs * 4 - cx) < w * 0.7) & (np.abs(ys * 4 - cy) < h * 0.7)
        )
        tag[..., 0] = np.where(inside, tag_val, tag[..., 0])

    parser = HeatmapParser(_cfg(), max_num_bbox=10)
    boxes, kpts = parser.parse(center[None], size_m[None], joint_hm[None],
                               tag[None])
    valid = boxes[0][boxes[0][:, 4] > 0]
    assert len(valid) == 2
    # each detected hand's keypoints should be near its GT joints
    for joints in joints_all:
        gc = joints.mean(axis=0)
        d = np.linalg.norm(valid[:, :2] - gc, axis=1)
        m = d.argmin()
        pred = kpts[0, m]
        err = np.abs(pred[:, :2] * 4 - joints).mean()
        assert err < 12.0, err


def test_single_hand_parser(rng):
    img, hm = 256, 64
    joints = rng.uniform(40, 200, size=(21, 2)).astype(np.float32)
    hm_i, _ = msra_heatmaps(joints, np.ones(21), (img, img), (hm, hm), 2.0,
                            unbiased=True)
    parser = HeatmapParserSH(_cfg())
    kpts = parser.parse_single(np.asarray(hm_i)[None])
    err = np.abs(kpts[0, :, :2] * 4 - joints).max()
    assert err < 4.0, err
