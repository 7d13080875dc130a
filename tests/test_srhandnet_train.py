"""SRHandNet end-to-end training path: multi-scale targets through the fused
device pipeline + SRHandNetLoss + DP train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.data.device_pipeline import DevicePipeline
from litehandnet_tpu.losses import get_loss
from litehandnet_tpu.models import get_model
from litehandnet_tpu.train import TrainState, make_mesh, make_train_step


@pytest.mark.slow
def test_srhandnet_multiscale_training(rng):
    IMG = 64
    cfg = config_from_dict(
        dict(
            MODEL=dict(name="srhandnet", output_channel=24, pred_bbox=True),
            DATASET=dict(
                name="freihand", num_joints=21, image_size=[IMG, IMG],
                heatmap_size=[[4, 4], [4, 4], [8, 8], [16, 16]],
            ),
            PIPELINE=dict(
                flip_prob=0.5, rot_prob=0, rot_factor=0, scale_factor=0.25,
                sigma=[2, 2, 2, 2], encoding="MSRA", unbiased_encoding=False,
                simdr_split_ratio=0,
            ),
            LOSS=dict(type="SRHandNetLoss",
                      loss_weight=[0.1, 0.2, 0.3, 0.4], auto_weight=False),
        )
    )
    B = 4
    pipe = DevicePipeline(cfg, list(range(21)), is_train=True)
    images = rng.randint(0, 255, size=(B, 96, 96, 3), dtype=np.uint8)
    joints = rng.uniform(20, 70, size=(B, 21, 2)).astype(np.float32)
    vis = np.ones((B, 21), np.float32)
    center = np.tile(np.float32([48, 48]), (B, 1))
    scale = np.tile(np.float32([96 / 200, 96 / 200]), (B, 1))
    bbox = np.tile(np.float32([20, 20, 50, 50]), (B, 1))
    batch = pipe(images, joints, vis, center, scale,
                 np.zeros(B, np.float32), jax.random.PRNGKey(0), bboxes=bbox)

    assert isinstance(batch["target"], (list, tuple)) and len(batch["target"]) == 4
    assert batch["target"][0].shape == (B, 4, 4, 24)
    assert batch["target"][3].shape == (B, 16, 16, 24)
    assert batch["target_weight"][0].shape == (B, 24)

    model = get_model(cfg)
    crit = get_loss(cfg)
    mv = model.init(jax.random.PRNGKey(1), batch["img"][:1], train=False)
    out = model.apply(mv, batch["img"][:1], train=False)
    assert [o.shape[1] for o in out] == [4, 4, 8, 16]
    cv = crit.init(jax.random.PRNGKey(2), out,
                   jax.tree.map(lambda x: x[:1], batch))

    import optax

    tx = optax.adam(1e-3)
    state = TrainState.create(mv, cv, tx)
    mesh = make_mesh(4)
    step = make_train_step(model, crit, tx, mesh, donate=False)
    train_batch = {
        "img": batch["img"],
        "target": list(batch["target"]),
        "target_weight": list(batch["target_weight"]),
    }
    losses = []
    for i in range(4):
        state, metrics = step(state, train_batch, jax.random.PRNGKey(3 + i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
