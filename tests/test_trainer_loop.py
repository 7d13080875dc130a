"""Trainer loop semantics vs the reference dist_train.py:

- eval fires on ``epoch % EVAL.interval == 0`` (includes the first epoch,
  dist_train.py:181);
- the periodic checkpoint saves on ``epoch % CHECKPOINT.interval == 0`` AND
  unconditionally on the final epoch (dist_train.py:224-225);
- ``OPTIMIZER.resume=False`` reloads weights only — fresh optimizer, epoch 0
  (dist_train.py:101-111);
- a full resume restores epoch/step and (unlike the reference, which resets
  its floor to 1e6 via the min_val_sum/min_val_loss key mismatch,
  dist_train.py:100,214 — see PARITY.md) the true best-loss floor.
"""

import jax
import numpy as np
import pytest


def _tiny_cfg(save_root, **updates):
    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.config.templates import make_cfg

    cfg = make_cfg(
        "litehandnet", "freihand", exp_id=995, image_size=64,
        **{"MODEL.input_channel": 32, "MODEL.num_stage": 3,
           "MODEL.num_block": [1, 1]})
    cfg["CHECKPOINT"].update(save_root=str(save_root) + "/", interval=100,
                             resume=False)
    cfg["TRAIN"].update(batch_per_gpu=2, total_epoches=5)
    cfg["EVAL"]["interval"] = 2
    cfg["OPTIMIZER"].update(warmup_steps=0)
    for key, val in updates.items():
        sec, _, name = key.partition(".")
        cfg[sec][name] = val
    return config_from_dict(cfg)


def _batch(rng):
    from litehandnet_tpu.ops.encode import msra_heatmaps

    B, IMG, HM = 2, 64, 16
    joints = rng.uniform(8, IMG - 8, size=(B, 21, 2)).astype(np.float32)
    target = np.stack([
        np.asarray(msra_heatmaps(j, np.ones(21), (IMG, IMG), (HM, HM), 1.5)[0])
        for j in joints
    ])
    return {
        "img": rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32),
        "target": target.astype(np.float32),
        "target_weight": np.ones((B, 21), np.float32),
    }


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Run one 5-epoch fit with spies on eval & checkpoint saves."""
    from litehandnet_tpu.train.trainer import Trainer

    root = tmp_path_factory.mktemp("trainer_loop")
    cfg = _tiny_cfg(root)
    rng = np.random.RandomState(0)
    batch = _batch(rng)

    trainer = Trainer(cfg, steps_per_epoch=1, num_devices=1)
    evals, periodic, bests = [], [], []
    orig_val = trainer.val_one_epoch

    def spy_val(state, batches, epoch):
        evals.append(epoch)
        return orig_val(state, batches, epoch)

    orig_save = trainer.ckpt.save

    def spy_save(state, epoch, min_val_loss=float("inf"), best=False, **kw):
        (bests if best else periodic).append(epoch)
        return orig_save(state, epoch, min_val_loss, best=best, **kw)

    trainer.val_one_epoch = spy_val
    trainer.ckpt.save = spy_save
    state = trainer.init_state(batch, seed=0)
    state = trainer.fit(state, lambda epoch: [batch], lambda: [batch])
    return root, cfg, state, evals, periodic, bests, trainer.min_val_loss


def test_eval_and_save_cadence(trained):
    _, _, state, evals, periodic, bests, _ = trained
    # 5 epochs, EVAL.interval=2 -> epochs 0, 2, 4 (reference cadence)
    assert evals == [0, 2, 4]
    # CHECKPOINT.interval=100 -> only epoch 0 periodically, plus the
    # unconditional final-epoch save
    assert periodic == [0, 4]
    # the first eval always beats the inf floor -> at least one best save,
    # all within eval epochs
    assert bests and set(bests) <= set(evals)
    assert int(state.step) == 5


def test_full_resume_restores_epoch_step_floor(trained):
    from litehandnet_tpu.train.trainer import Trainer

    root, _, state, _, _, _, floor = trained
    # OPTIMIZER.resume defaults to False in the mirrored reference configs,
    # so a full resume must opt in explicitly
    cfg = _tiny_cfg(root, **{"CHECKPOINT.resume": True,
                             "OPTIMIZER.resume": True})
    trainer = Trainer(cfg, steps_per_epoch=1, num_devices=1)
    resumed = trainer.maybe_resume(trainer.init_state(_batch(
        np.random.RandomState(0)), seed=0))
    # the `checkpoint` slot was written on the final epoch (4)
    assert trainer.start_epoch == 5
    assert int(resumed.step) == 5
    # the true floor is restored (reference defect: resets to 1e6)
    assert trainer.min_val_loss == pytest.approx(floor)
    leaf = jax.tree.leaves(resumed.params)[0]
    want = jax.tree.leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(want))


def test_weights_only_resume(trained):
    from litehandnet_tpu.train.trainer import Trainer

    root, _, state, _, _, _, _ = trained
    # the optimizer TYPE also changes (Adam -> SGD): a weights-only restart
    # must not depend on the checkpoint's optimizer tree (raw restore)
    cfg = _tiny_cfg(root, **{"CHECKPOINT.resume": True,
                             "OPTIMIZER.resume": False,
                             "OPTIMIZER.type": "SGD",
                             "OPTIMIZER.warmup_steps": 50})
    trainer = Trainer(cfg, steps_per_epoch=1, num_devices=1)
    base_lr = float(cfg.OPTIMIZER.lr)
    # before resume the schedule starts on the warmup ramp
    assert float(trainer.schedule(0)) == pytest.approx(base_lr / 50,
                                                       rel=1e-4)
    resumed = trainer.maybe_resume(trainer.init_state(_batch(
        np.random.RandomState(0)), seed=0))
    # weights reloaded...
    leaf = jax.tree.leaves(resumed.params)[0]
    want = jax.tree.leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(want))
    # ...but epoch, optimizer step, and the best floor start fresh
    assert trainer.start_epoch == 0
    assert int(resumed.step) == 0
    assert trainer.min_val_loss == float("inf")
    # and the warmup pre-pass is skipped like the reference
    # (dist_train.py:145-147): full LR from step 0
    assert float(trainer.schedule(0)) == pytest.approx(base_lr)
