"""CLI drive of the evaluator (tools/test.py) on the stacked mynet config:
the SimDR decode path must be fused alongside the heatmap decode (reference
test.py:117-147)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_simdr_setup(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("simdr_ds")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        arr = rng.randint(0, 255, size=(64, 64, 3), dtype=np.uint8)
        name = f"img_{i:03d}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        images.append(dict(id=i, file_name=f"images/{name}", width=64,
                           height=64))
        kpts = []
        for x, y in rng.uniform(10, 54, size=(21, 2)):
            kpts += [float(x), float(y), 1]
        annotations.append(dict(
            id=i, image_id=i, category_id=1, iscrowd=0, keypoints=kpts,
            bbox=[6.0, 6.0, 52.0, 52.0], area=2704.0,
        ))
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="hand")],
    )))

    ckpt_root = tmp_path_factory.mktemp("ckpts")
    cfg_file = root / "exp_cfg.py"
    cfg_file.write_text(f"""
from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    cfg = make_cfg("mynet_stacked", "freihand", exp_id=999, image_size=64,
                   **{{"MODEL.main_channels": 32, "MODEL.hg_depth": 3}})
    for split in ("train", "val", "test"):
        cfg["DATASET"][split] = dict(
            ann_file={str(ann_file)!r}, img_prefix={str(root) + "/"!r})
    cfg["CHECKPOINT"]["save_root"] = {str(ckpt_root)!r}
    return cfg
""")
    return str(cfg_file)


def test_eval_cli_decodes_simdr(tiny_simdr_setup):
    from litehandnet_tpu.tools.test import main

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.train.checkpoint import run_dir

    # without a trained checkpoint the evaluator refuses, like the reference
    # (test.py:100-101) — --allow-init opts into random-init evaluation
    with pytest.raises(FileNotFoundError, match="model not exist"):
        main(["--cfg", tiny_simdr_setup, "--batch-size", "4"])

    name_value = main(["--cfg", tiny_simdr_setup, "--batch-size", "4",
                       "--allow-init"])
    # heatmap metrics present
    assert "PCK" in name_value and "AUC" in name_value
    # SimDR branch decoded and evaluated (reference test.py:144-147)
    assert "simdr_AUC" in name_value, sorted(name_value)
    assert np.isfinite(float(name_value["simdr_AUC"]))
    # metric file name tracks the evaluated slot (reference test.py:53-61)
    rd = run_dir(get_config(tiny_simdr_setup))
    assert os.path.exists(os.path.join(rd, "checkpoint_pth_metric.json"))

    # --train evaluates the train split into a SEPARATE file so it can never
    # masquerade as test-split metrics
    main(["--cfg", tiny_simdr_setup, "--batch-size", "4", "--allow-init",
          "--train"])
    assert os.path.exists(os.path.join(rd, "train_checkpoint_pth_metric.json"))


def test_eval_cli_data_parallel_matches_single_device(tiny_simdr_setup):
    """--data-parallel shards the eval batch over the 8 virtual devices
    (the reference's nn.DataParallel eval wrap, test.py:81) and must
    reproduce the single-device metrics exactly (coords differ only by
    f32 reduction order in the DARK blur, inside the PCK thresholds)."""
    import numpy as np

    from litehandnet_tpu.tools.test import main

    plain = main(["--cfg", tiny_simdr_setup, "--batch-size", "8",
                  "--allow-init"])
    dp = main(["--cfg", tiny_simdr_setup, "--batch-size", "8",
               "--allow-init", "--data-parallel"])
    assert set(dp) == set(plain)
    for k in plain:
        np.testing.assert_allclose(float(dp[k]), float(plain[k]),
                                   rtol=1e-6, atol=1e-3, err_msg=k)
