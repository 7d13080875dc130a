"""CLI drive of the Gen-1 center+SimDR trainer (tools/train_center_simdr.py)
with the cycle-detection second pass forced on.

Reference workflow: train_distributed_center_simdr_freihand.py — stacked
MS-att hourglass w/ region maps + SimDR heads, sine-decay LR, and the
re-crop-GT-bboxes second training pass (:203-211). One source image is
larger than the decode canvas so the cycle-detection crop geometry runs in
canvas coordinates (regression: it used original-image coords)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def gen1_setup(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("gen1_ds")
    (root / "images").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(8):
        # image 0 is larger than the 2x-crop canvas (128) to engage the
        # loader's ROI/downscale path under the cycle-detection re-crop
        w = h = 320 if i == 0 else 64
        arr = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        name = f"img_{i:03d}.jpg"
        Image.fromarray(arr).save(root / "images" / name)
        images.append(dict(id=i, file_name=f"images/{name}", width=w,
                           height=h))
        kpts = []
        for x, y in rng.uniform(0.2, 0.8, size=(21, 2)) * [w, h]:
            kpts += [float(x), float(y), 1]
        annotations.append(dict(
            id=i, image_id=i, category_id=1, iscrowd=0, keypoints=kpts,
            bbox=[w * 0.1, h * 0.1, w * 0.8, h * 0.8], area=w * h * 0.64,
        ))
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="hand")],
    )))

    ckpt_root = tmp_path_factory.mktemp("gen1_ckpts")
    cfg_file = root / "exp_cfg.py"
    cfg_file.write_text(f"""
from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    cfg = make_cfg("mynet_stacked", "freihand", exp_id=998, image_size=64,
                   **{{"MODEL.main_channels": 32, "MODEL.hg_depth": 3}})
    for split in ("train", "val", "test"):
        cfg["DATASET"][split] = dict(
            ann_file={str(ann_file)!r}, img_prefix={str(root) + "/"!r})
    cfg["CHECKPOINT"]["save_root"] = {str(ckpt_root)!r}
    cfg["TRAIN"]["batch_per_gpu"] = 1
    cfg["TRAIN"]["total_epoches"] = 1
    cfg["OPTIMIZER"]["lr"] = 1e-3
    return cfg
""")
    return str(cfg_file)


@pytest.mark.slow
def test_gen1_trainer_with_cycle_detection(gen1_setup):
    from litehandnet_tpu.tools.train_center_simdr import main

    state = main([
        "--cfg", gen1_setup, "--num-devices", "1", "--workers", "2",
        "--cd-prob", "1.0",
    ])
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(state.params)]
    assert all(np.isfinite(p).all() for p in leaves)


def test_sine_decay_schedule_shape():
    from litehandnet_tpu.tools.train_center_simdr import sine_decay_schedule

    sched = sine_decay_schedule(1.0, steps_per_epoch=10, T=40, lr_gamma=0.5)
    v0 = float(sched(0))
    v_mid = float(sched(10 * 20))  # epoch 20
    v_end = float(sched(10 * 39))  # epoch 39
    assert v0 == pytest.approx(1.0)
    assert v0 > v_mid > v_end > 0.0


def test_sine_decay_matches_reference_lambda_lr():
    """Golden vs the reference's LambdaLR stepping rule: lr during epoch e
    is base*lambda1(counter), and the counter only advances while
    lr > 5e-7 (train_distributed_center_simdr_freihand.py:110-113,215-217)
    — so the cosine freezes near the end of the first period and never
    restarts. Our schedule floors at 5e-7 instead; the frozen reference
    value lies in [0, 5e-7], so they agree to within 5e-7 everywhere."""
    from litehandnet_tpu.tools.train_center_simdr import sine_decay_schedule

    T, gamma, base = 40, 0.5, 1e-3
    sched = sine_decay_schedule(base, steps_per_epoch=1, T=T, lr_gamma=gamma)

    def lambda1(e):
        period = T + e / T
        return np.cos((e % period) / period * np.pi / 2) * gamma ** (e / T)

    counter = 0
    froze = False
    for epoch in range(120):
        ref_lr = base * lambda1(counter)
        assert abs(float(sched(epoch)) - ref_lr) <= 5e-7, (epoch, ref_lr)
        if ref_lr > 5e-7:
            counter += 1
        else:
            froze = True
    assert froze  # the freeze fires within the first period (never restarts)
