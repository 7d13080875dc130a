"""Smoke-drive the demo and weight-analysis CLIs with a trained checkpoint
present: both must pick up the saved run via ``CheckpointManager.restore_raw``
(a template-free restore, so these read-only tools never depend on how the
training run was configured), and the demo must apply deploy-mode RepConv
fusion for litehandnet (reference test.py:77-107, utils/weight_analysis.py).
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tool_setup(tmp_path_factory):
    """Tiny litehandnet config + a saved checkpoint whose params are
    perturbed away from init, so "restored" is distinguishable."""
    import jax
    import jax.numpy as jnp
    import optax

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.train.checkpoint import CheckpointManager, run_dir
    from litehandnet_tpu.train.state import TrainState

    root = tmp_path_factory.mktemp("tools_cli")
    ckpt_root = root / "ckpts"
    cfg_file = root / "exp_cfg.py"
    cfg_file.write_text(f"""
from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    cfg = make_cfg(
        "litehandnet", "freihand", exp_id=998, image_size=64,
        **{{"MODEL.input_channel": 32, "MODEL.num_stage": 3,
           "MODEL.num_block": [1, 1]}})
    cfg["CHECKPOINT"]["save_root"] = {str(ckpt_root) + "/"!r}
    return cfg
""")

    cfg = get_config(str(cfg_file))
    model = get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    # scale every param by 3 so restored-vs-init is detectable in stats
    variables = dict(variables)
    variables["params"] = jax.tree.map(lambda p: p * 3.0, variables["params"])
    state = TrainState.create(variables, {}, optax.sgd(0.1))
    CheckpointManager(run_dir(cfg), cfg).save(state, epoch=1)

    expect_std = {
        "/".join(str(k.key) for k in path): float(jnp.std(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]
    }
    return str(cfg_file), str(root), expect_std


def test_analyze_weights_restores_checkpoint(tool_setup, capsys):
    from litehandnet_tpu.tools.analyze_weights import main

    cfg_file, root, expect_std = tool_setup
    out_json = os.path.join(root, "weights.json")
    main(["--cfg", cfg_file, "--out", out_json, "--top", "5"])
    assert "analyzed restored checkpoint" in capsys.readouterr().out

    hists = json.load(open(out_json))
    assert len(hists) == len(expect_std)
    # the histogram stats must describe the (perturbed) checkpoint, not init
    for name, h in hists.items():
        assert np.isclose(h["std"], expect_std[name], rtol=1e-4), name


def test_demo_runs_fused_checkpoint(tool_setup, capsys, tmp_path):
    from PIL import Image

    from litehandnet_tpu.tools.demo import main

    cfg_file, _, _ = tool_setup
    img = tmp_path / "frame.jpg"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (96, 96, 3), np.uint8)
    ).save(img)
    out_dir = tmp_path / "demo_out"
    main(["--cfg", cfg_file, "--inputs", str(img), "--out-dir", str(out_dir)])

    out = capsys.readouterr().out
    assert "no checkpoint found" not in out
    assert (out_dir / "frame.jpg").exists()


def test_read_only_tools_do_not_touch_run_dirs(tool_setup, tmp_path, capsys):
    """The demo / weight-analysis CLIs restore read-only: no run directory
    is created and the training run's recorded config.json is preserved."""
    import json
    import os

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.tools.analyze_weights import main
    from litehandnet_tpu.train.checkpoint import run_dir

    cfg_file, _, _ = tool_setup
    # 1) the trained run's config.json survives an analyze pass verbatim
    rd = run_dir(get_config(cfg_file))
    before = open(os.path.join(rd, "config.json")).read()
    main(["--cfg", cfg_file, "--top", "1"])
    assert open(os.path.join(rd, "config.json")).read() == before

    # 2) with an untrained save_root, nothing is created on disk
    empty_root = tmp_path / "never_trained"
    cfg2 = tmp_path / "exp_cfg2.py"
    cfg2.write_text(f"""
from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    cfg = make_cfg(
        "litehandnet", "freihand", exp_id=998, image_size=64,
        **{{"MODEL.input_channel": 32, "MODEL.num_stage": 3,
           "MODEL.num_block": [1, 1]}})
    cfg["CHECKPOINT"]["save_root"] = {str(empty_root) + "/"!r}
    return cfg
""")
    main(["--cfg", str(cfg2), "--top", "1"])
    assert "no checkpoint; analyzing init" in capsys.readouterr().out
    assert not empty_root.exists()


def test_twin_accuracy_report(tmp_path):
    """The twin-accuracy report merges the two side jsons, cross-checks
    the init checksum, and writes the markdown table."""
    import json

    from litehandnet_tpu.tools.twin_accuracy import main

    metrics = dict(pck20=0.99, pck05=0.9, auc=0.95, epe=1.2)
    for side, epe in (("torch", 1.2), ("flax", 1.3)):
        m = dict(metrics, epe=epe)
        (tmp_path / f"{side}.json").write_text(json.dumps(dict(
            side=side, init_checksum=["stem.weight", "abc123"],
            loss_first=2.2, loss_tail=0.01, train=m, eval=m, wall_s=1.0,
        )))
    out = tmp_path / "report.md"
    main(["--side", "report", "--workdir", str(tmp_path),
          "--report-out", str(out)])
    text = out.read_text()
    assert "abc123" in text and "flax/TPU" in text and "0.9900" in text

    # checksum mismatch must refuse to report
    bad = json.loads((tmp_path / "flax.json").read_text())
    bad["init_checksum"] = ["stem.weight", "zzz"]
    (tmp_path / "flax.json").write_text(json.dumps(bad))
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        main(["--side", "report", "--workdir", str(tmp_path),
              "--report-out", str(out)])


def test_twin_torch_side_resume_equivalence(tmp_path):
    """The torch control checkpoints every 25 steps and resumes EXACTLY:
    a run restarted from the step-0 snapshot must produce the same losses,
    metrics, and final json as the uninterrupted run (the control loop is
    deterministic given the precomputed batch order)."""
    from tests import ref_loader

    ref_loader.ensure_reference_importable()
    from litehandnet_tpu.tools.twin_accuracy import main

    argv = ["--side", "torch", "--family", "litehrnet",
            "--refcfg", "config/litehrnet/_2_freihand_224x244_dark_18.py",
            "--mode", "heatmap", "--size", "64", "--train-n", "8",
            "--eval-n", "4", "--batch", "2", "--steps", "3",
            "--lr", "2e-3", "--seed", "7", "--workdir", str(tmp_path)]
    out = main(list(argv))
    full = json.loads(open(out).read())
    # the step-0 snapshot exists and claims next_si=1
    import torch

    ck = torch.load(tmp_path / "torch_ckpt.pt", map_location="cpu",
                    weights_only=False)
    assert ck["next_si"] == 1 and len(ck["losses"]) == 1
    # re-running with the snapshot present resumes from step 1 and must
    # reproduce the uninterrupted run bit-for-bit (minus wall time)
    out2 = main(list(argv))
    resumed = json.loads(open(out2).read())
    assert resumed["loss_first"] == full["loss_first"]
    assert resumed["loss_tail"] == full["loss_tail"]
    assert resumed["train"] == full["train"]
    assert resumed["eval"] == full["eval"]
    # a different protocol must NOT resume from the stale snapshot
    ck["fingerprint"][3] = 999  # seed
    torch.save(ck, tmp_path / "torch_ckpt.pt")
    out3 = main(list(argv) + ["--steps", "3"])
    assert json.loads(open(out3).read())["loss_first"] == full["loss_first"]
