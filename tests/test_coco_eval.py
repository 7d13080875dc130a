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


@pytest.fixture(scope="module")
def hand_gt_dt():
    """Synthetic 21-kpt hand GT + noisy detections covering crowd gts,
    zero-visibility gts, false positives, duplicates, and mixed areas."""
    rng = np.random.RandomState(7)
    images, annotations = [], []
    detections = []
    aid = 1
    for i in range(10):
        images.append(dict(id=i, file_name=f"{i}.jpg", width=640, height=480))
        for h in range(rng.randint(1, 4)):
            side = rng.choice([40.0, 80.0, 150.0])   # mixes area ranges
            x, y = rng.uniform(0, 400), rng.uniform(0, 300)
            joints = np.stack([
                rng.uniform(x, x + side, 21), rng.uniform(y, y + side, 21)
            ], axis=1)
            vis = np.full(21, 2.0)
            if aid % 7 == 0:
                vis[:] = 0.0                          # unlabeled gt
            kpts = np.concatenate([joints, vis[:, None]], 1).flatten()
            annotations.append(dict(
                id=aid, image_id=i, category_id=1,
                iscrowd=1 if aid % 11 == 0 else 0,
                keypoints=[float(v) for v in kpts],
                bbox=[float(x), float(y), float(side), float(side)],
                area=float(side * side), num_keypoints=int((vis > 0).sum()),
            ))
            aid += 1
            # 1-2 noisy detections per gt + occasional duplicate
            for _ in range(rng.randint(1, 3)):
                noise = rng.normal(0, side * 0.05, joints.shape)
                dk = np.concatenate(
                    [joints + noise, np.full((21, 1), 1.0)], 1
                ).flatten()
                detections.append(dict(
                    image_id=i, category_id=1,
                    keypoints=[float(v) for v in dk],
                    score=float(rng.uniform(0.3, 1.0)),
                ))
        # false positive far away
        if i % 3 == 0:
            fp = np.stack([
                rng.uniform(500, 630, 21), rng.uniform(380, 470, 21)
            ], axis=1)
            dk = np.concatenate([fp, np.full((21, 1), 1.0)], 1).flatten()
            detections.append(dict(
                image_id=i, category_id=1,
                keypoints=[float(v) for v in dk],
                score=float(rng.uniform(0.3, 1.0)),
            ))
    gt_dataset = dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="hand")],
    )
    return gt_dataset, detections


def test_cocoeval_matches_reference_vendored_evaluator(hand_gt_dt):
    """The exact-COCO keypoint evaluator must reproduce the reference's
    vendored MYeval_hand (myeval_hand.py:14-501) to 1e-6 on all 10 stats."""
    from tests import ref_loader

    if not ref_loader.reference_available():
        pytest.skip("reference checkout absent")
    from litehandnet_tpu.data.coco import COCO
    from litehandnet_tpu.eval.cocoeval import KeypointCOCOeval

    gt_dataset, detections = hand_gt_dt
    gt = COCO.from_dict(gt_dataset)
    mine = KeypointCOCOeval(gt, detections).run()

    myeval = ref_loader.load_myeval_hand()
    dt = gt.loadRes(detections)
    ref = myeval.MYeval_hand(gt, dt, "keypoints")
    ref.params.imgIds = sorted(gt.getImgIds())
    ref.evaluate()
    ref.accumulate()
    ref.summarize()
    np.testing.assert_allclose(mine, ref.stats, atol=1e-6, rtol=0)


@pytest.mark.parametrize(
    "part", ["body", "foot", "face", "lefthand", "righthand", "wholebody"]
)
def test_wholebody_part_matches_reference(part):
    """Per-part wholebody evaluators vs the reference's vendored versions on
    the reference's own example GT/pred files
    (coco_wholebody_evaluation/example_{gt,pred}.json), to 1e-6."""
    from tests import ref_loader

    if not ref_loader.reference_available():
        pytest.skip("reference checkout absent")
    import os.path as osp

    from litehandnet_tpu.data.coco import COCO
    from litehandnet_tpu.eval.wholebody import evaluate_part

    gt_file = osp.join(ref_loader.REF_ROOT, ref_loader.WHOLEBODY_DIR,
                       "example_gt.json")
    pred_file = osp.join(ref_loader.REF_ROOT, ref_loader.WHOLEBODY_DIR,
                         "example_pred.json")
    gt = COCO(gt_file)
    detections = json.loads(open(pred_file).read())

    mine = evaluate_part(gt, detections, part)

    mod = ref_loader.load_wholebody_evaluator(part)
    ref_cls = getattr(mod, f"MYeval_{part}")
    # the reference driver applies check_part_score first
    # (evaluation_wholebody.py:82-98): '<part>_score' falls back to 'score'
    ref_dets = [
        dict(d, **{f"{part}_score": d.get(f"{part}_score", d["score"])})
        for d in detections
    ]
    dt = gt.loadRes(ref_dets)
    ref = ref_cls(gt, dt, "keypoints")
    ref.params.useSegm = None
    ref.evaluate()
    ref.accumulate()
    ref.summarize()
    np.testing.assert_allclose(mine, ref.stats, atol=1e-6, rtol=0)


def test_eval_wholebody_cli(capsys):
    """CLI smoke of tools/eval_wholebody.py on the reference's own example
    GT/pred files (the evaluator itself is parity-tested above)."""
    import os.path as osp

    from tests import ref_loader

    if not ref_loader.reference_available():
        pytest.skip("reference checkout absent")
    from litehandnet_tpu.tools.eval_wholebody import main

    gt_file = osp.join(ref_loader.REF_ROOT, ref_loader.WHOLEBODY_DIR,
                       "example_gt.json")
    pred_file = osp.join(ref_loader.REF_ROOT, ref_loader.WHOLEBODY_DIR,
                         "example_pred.json")
    results = main(["--gt_file", gt_file, "--res_file", pred_file,
                    "--parts", "lefthand", "righthand"])
    assert results and all(np.isfinite(v) for v in results.values())
    out = capsys.readouterr().out
    assert "lefthand" in out and "righthand" in out
