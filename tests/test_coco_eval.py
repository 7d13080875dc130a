"""COCO body dataset: OKS mAP evaluation path with GT-as-prediction."""

import json

import numpy as np
import pytest

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.data import build_dataset


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 0
    for i in range(6):
        images.append(
            dict(id=i, file_name=f"images/{i:04d}.jpg", width=640, height=480)
        )
        for _ in range(2):  # two people per image
            x, y = rng.uniform(0, 300, 2)
            w, h = rng.uniform(100, 200, 2)
            joints = np.stack(
                [rng.uniform(x, x + w, 17), rng.uniform(y, y + h, 17)], axis=1
            )
            kpts = []
            for jx, jy in joints:
                kpts += [float(jx), float(jy), 2]
            annotations.append(
                dict(
                    id=aid, image_id=i, category_id=1, iscrowd=0,
                    keypoints=kpts, bbox=[float(x), float(y), float(w), float(h)],
                    area=float(w * h), num_keypoints=17,
                )
            )
            aid += 1
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="person")],
    )))
    return str(root) + "/", str(ann_file)


def test_coco_map_with_gt_predictions(tiny_coco):
    prefix, ann_file = tiny_coco
    cfg = config_from_dict(
        dict(
            DATASET=dict(
                name="coco", num_joints=17, image_size=[192, 256],
                heatmap_size=[48, 64],
                train=dict(ann_file=ann_file, img_prefix=prefix),
                val=dict(ann_file=ann_file, img_prefix=prefix),
                test=dict(ann_file=ann_file, img_prefix=prefix),
            )
        )
    )
    ds = build_dataset(cfg, "val")
    assert len(ds) == 12

    # GT keypoints as predictions -> mAP must be 1.0
    preds, boxes, paths, ids = [], [], [], []
    for rec in ds.db:
        kp = np.concatenate(
            [rec["joints_3d"][:, :2], np.full((17, 1), 0.9, np.float32)],
            axis=1,
        )
        preds.append(kp)
        boxes.append(
            np.concatenate([
                rec["center"], rec["scale"],
                [float(np.prod(rec["scale"] * 200)), 1.0],
            ]).astype(np.float32)
        )
        paths.append(rec["image_file"])
        ids.append(rec["bbox_id"])
    results = [dict(preds=np.stack(preds), boxes=np.stack(boxes),
                    image_paths=paths, bbox_ids=ids)]
    stats = ds.evaluate(results, metric="mAP")
    assert stats["AP"] == 1.0, stats
    assert stats["AP .5"] == 1.0
    assert set(stats) >= {"AP", "AP .5", "AP .75", "AP (M)", "AP (L)", "mAP"}

    # shifted predictions must lose AP
    for r in results:
        r["preds"] = r["preds"] + np.array([80.0, 80.0, 0.0])
    worse = ds.evaluate(results, metric="mAP")
    assert worse["AP"] < 0.5, worse
