"""End-to-end overfit-one-batch test (SURVEY.md §4 build-plan milestone):
a tiny LiteHandNet must drive PCK on a fixed synthetic batch toward 1 within
a small step budget, proving the full loss/grad/decode loop is wired right."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.losses import get_loss
from litehandnet_tpu.models import get_model
from litehandnet_tpu.ops.decode import keypoints_from_heatmaps
from litehandnet_tpu.ops.encode import msra_heatmaps
from litehandnet_tpu.train import TrainState, make_mesh, make_train_step
from litehandnet_tpu.train.optim import make_optimizer


@pytest.mark.slow
def test_overfit_one_batch(rng):
    IMG, HM = 64, 16
    cfg = config_from_dict(
        dict(
            MODEL=dict(
                name="litehandnet", num_stage=3, num_block=[1, 1],
                input_channel=32, ca_type="se", reduction=2,
                activation="leakyrelu", output_channel=21,
            ),
            DATASET=dict(num_joints=21, image_size=[IMG, IMG],
                         heatmap_size=[HM, HM]),
            PIPELINE=dict(simdr_split_ratio=0),
            LOSS=dict(type="TopdownHeatmapLoss", loss_weight=[1.0],
                      auto_weight=False),
        )
    )
    B = 4
    joints = rng.uniform(8, IMG - 8, size=(B, 21, 2)).astype(np.float32)
    imgs = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
    targets = np.stack([
        np.asarray(msra_heatmaps(j, np.ones(21), (IMG, IMG), (HM, HM), 1.5,
                                 unbiased=True)[0])
        for j in joints
    ])
    batch = {
        "img": jnp.asarray(imgs),
        "target": jnp.asarray(targets),
        "target_weight": jnp.ones((B, 21)),
    }

    mesh = make_mesh(4)
    model = get_model(cfg, axis_name="data")
    crit = get_loss(cfg)
    mv = model.init(jax.random.PRNGKey(0), batch["img"], train=False)
    cv = crit.init(jax.random.PRNGKey(1), batch["target"], batch)
    import optax

    tx = optax.adam(2e-3)
    state = TrainState.create(mv, cv, tx)
    step = make_train_step(model, crit, tx, mesh, donate=False)

    def pck(state):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["img"], train=False,
        )
        preds, _ = keypoints_from_heatmaps(
            out, np.tile([IMG / 2, IMG / 2], (B, 1)).astype(np.float32),
            np.tile([IMG / 200, IMG / 200], (B, 1)).astype(np.float32),
            post_process=None,
        )[0::2]
        err = np.linalg.norm(
            np.asarray(preds) * (IMG / HM) - joints, axis=-1
        )
        return float((err < IMG * 0.1).mean())

    start_pck = pck(state)
    key = jax.random.PRNGKey(2)
    for i in range(60):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    end_pck = pck(state)
    # 60 CPU steps reach ~0.68 from 0.0; assert solid learning,
    # not full convergence (wiring test, not a training benchmark)
    assert end_pck > start_pck + 0.5 and end_pck > 0.55, (start_pck, end_pck)
