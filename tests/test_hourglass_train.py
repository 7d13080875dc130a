"""CLI drive of the Gen-2 trainer (tools/train.py) on a stacked-hourglass
config with the reference's list-sigma PIPELINE (sigma=[2]*num_stack, e.g.
config/hourglass/_2_freihand2d_224x224_dark_h2.py:44): the device pipeline
must emit stacked [B, S, H, W, K] targets that pair with the model's
per-stack outputs (regression: it silently encoded sigma[0] only, and the
loss's implicit broadcast errored for batch != num_stack)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def hourglass_setup(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("hg_ds")
    (root / "images").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    # 6 samples with batch 3 != num_stack 2 exercises the shape bug
    for i in range(6):
        arr = rng.randint(0, 255, size=(64, 64, 3), dtype=np.uint8)
        name = f"img_{i:03d}.jpg"
        Image.fromarray(arr).save(root / "images" / name)
        images.append(dict(id=i, file_name=f"images/{name}", width=64,
                           height=64))
        kpts = []
        for x, y in rng.uniform(10, 54, size=(21, 2)):
            kpts += [float(x), float(y), 1]
        annotations.append(dict(
            id=i, image_id=i, category_id=1, iscrowd=0, keypoints=kpts,
            bbox=[6.0, 6.0, 52.0, 52.0], area=2704.0,
        ))
    (root / "ann.json").write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="hand")],
    )))

    ckpt_root = tmp_path_factory.mktemp("hg_ckpts")
    cfg_file = root / "exp_cfg.py"
    cfg_file.write_text(f"""
from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    cfg = make_cfg("hourglass", "freihand", exp_id=997, image_size=64,
                   **{{"MODEL.num_stack": 2, "MODEL.input_channel": 64,
                       "MODEL.num_level": 3}})
    cfg["PIPELINE"]["sigma"] = [2, 2]  # reference list-sigma convention
    for split in ("train", "val", "test"):
        cfg["DATASET"][split] = dict(
            ann_file={str(root / "ann.json")!r},
            img_prefix={str(root) + "/"!r})
    cfg["CHECKPOINT"]["save_root"] = {str(ckpt_root)!r}
    cfg["TRAIN"]["batch_per_gpu"] = 3
    cfg["TRAIN"]["total_epoches"] = 1
    cfg["EVAL"]["interval"] = 1
    return cfg
""")
    return str(cfg_file)


@pytest.mark.slow
def test_train_cli_stacked_hourglass(hourglass_setup):
    from litehandnet_tpu.tools.train import main

    state = main(["--cfg", hourglass_setup, "--num-devices", "1",
                  "--workers", "2"])
    leaves = [np.asarray(p) for p in __import__("jax").tree.leaves(
        state.params
    )]
    assert all(np.isfinite(p).all() for p in leaves)
