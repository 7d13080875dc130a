"""Top-down trainer: epoch loops, eval gating, best-model tracking.

The functional rebuild of the reference trainer
(dist_train.py:50-233 + train/topdown_trainer.py): one jitted DP train step
over the mesh instead of per-process DDP, LR warmup folded into the optax
schedule, bf16-ready, chief-only logging/checkpointing.

The trainer is data-source agnostic: `train_batches()` / `val_batches()` are
callables returning an iterable of batch dicts (numpy or jax arrays, global
batch leading dim divisible by the mesh size).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from litehandnet_tpu.losses import get_loss
from litehandnet_tpu.models import get_model
from litehandnet_tpu.train.checkpoint import CheckpointManager, run_dir
from litehandnet_tpu.train.distributed import (
    globalize_batch,
    is_chief,
    make_eval_step,
    make_mesh,
    make_train_step,
)
from litehandnet_tpu.train.optim import make_optimizer_from_config
from litehandnet_tpu.train.state import TrainState
from litehandnet_tpu.utils.logging_ import MetricLogger


class Trainer:
    def __init__(
        self,
        cfg,
        steps_per_epoch: int,
        num_devices: Optional[int] = None,
        log_dir: Optional[str] = None,
    ):
        self.cfg = cfg
        self.mesh = make_mesh(num_devices)
        # the mesh is built over jax.devices() == ALL devices across
        # processes, so its size already IS the world size (reference LR
        # scaling: lr * world, optimizer_scheduler.py)
        world = int(self.mesh.devices.size)
        sync_bn = bool(cfg.TRAIN.get("syncBN", False))
        # cross-device BN needs a named mesh axis, which only exists on the
        # shard_map path (mesh size > 1); single-device SyncBN == plain BN
        use_axis = sync_bn and int(self.mesh.devices.size) > 1
        self.model = get_model(cfg, axis_name="data" if use_axis else None)
        self.criterion = get_loss(cfg)
        self._world = world
        self.tx, self.schedule = make_optimizer_from_config(
            cfg, steps_per_epoch=steps_per_epoch, world_size=world
        )
        self.train_step = make_train_step(
            self.model, self.criterion, self.tx, self.mesh
        )
        self.eval_step = make_eval_step(self.model, self.criterion, self.mesh)
        self.steps_per_epoch = steps_per_epoch
        directory = log_dir or run_dir(cfg)
        self.ckpt = CheckpointManager(directory, cfg)
        self.logger = MetricLogger(directory, enabled=is_chief())
        self.min_val_loss = float("inf")
        self.start_epoch = 0

    # -- state ------------------------------------------------------------
    def init_state(self, sample_batch, seed: int = 0) -> TrainState:
        img = jax.numpy.asarray(sample_batch["img"])
        mv = self.model.init(jax.random.PRNGKey(seed), img, train=False)
        # criteria consume the model's raw output structure (tuple of scales
        # for SRHandNetLoss, stacked array for hourglass)
        out0 = self.model.apply(mv, img[:1], train=False)
        cv = self.criterion.init(
            jax.random.PRNGKey(seed + 1), out0, _to_local(sample_batch, 1)
        )
        scaler = None
        if self.cfg.TRAIN.get("loss_scale", False):
            # fp16-style dynamic loss scaling (reference train/fp16_utils/);
            # unnecessary on bf16 TPUs, kept for fp16-preferred hardware
            from litehandnet_tpu.train.precision import DynamicLossScaler

            scaler = DynamicLossScaler.create()
        return self._replicate(
            TrainState.create(mv, cv, self.tx, loss_scaler=scaler)
        )

    def _replicate(self, state: TrainState) -> TrainState:
        """Place state replicated over the mesh (restored checkpoints come
        back committed to a single device, which shard_map rejects)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P())
        return jax.device_put(state, sharding)

    def maybe_resume(self, state: TrainState) -> TrainState:
        if not self.cfg.CHECKPOINT.get("resume", False):
            return state
        best = self.cfg.CHECKPOINT.get("load_best", False)
        if not self.cfg.OPTIMIZER.get("resume", True):
            # weights-only resume (dist_train.py:101-111 gates the
            # optimizer-state/epoch reload on OPTIMIZER.resume): reload
            # params/BN stats/criterion params, keep a fresh optimizer,
            # epoch 0, and a reset best-loss floor. Restored RAW (no typed
            # template) so the reload works even when the optimizer/loss
            # configuration changed since the checkpoint — the very use
            # case of a weights-only restart. The reference also SKIPS its
            # warmup pre-pass whenever a checkpoint exists
            # (dist_train.py:145-147), so rebuild the schedule without
            # warmup — training restarts at full LR with epoch-0 decay
            # boundaries, not a replayed ramp.
            raw, _ = self.ckpt.restore_raw(best=best)
            if raw is None:
                return state
            if int(self.cfg.OPTIMIZER.get("warmup_steps", 0) or 0) > 0:
                from litehandnet_tpu.config import config_from_dict

                cfg_nowarm = config_from_dict(self.cfg.to_dict())
                cfg_nowarm.OPTIMIZER.warmup_steps = 0
                self.tx, self.schedule = make_optimizer_from_config(
                    cfg_nowarm, steps_per_epoch=self.steps_per_epoch,
                    world_size=self._world,
                )
                self.train_step = make_train_step(
                    self.model, self.criterion, self.tx, self.mesh
                )
            fresh = TrainState.create(
                {"params": raw["params"],
                 "batch_stats": raw.get("batch_stats") or {}},
                {"params": raw.get("crit_params") or {}},
                self.tx, loss_scaler=state.loss_scaler,
            )
            return self._replicate(fresh)
        restored, meta = self.ckpt.restore(state, best=best)
        if restored is None:
            return state
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        # the reference resets the floor to 1e6 on every resume — it saves
        # the key as 'min_val_sum' but reads 'min_val_loss'
        # (dist_train.py:100,214), so a resumed run can overwrite `best`
        # with a worse model; restoring the true floor fixes that (PARITY.md)
        self.min_val_loss = float(meta.get("min_val_loss", float("inf")))
        return self._replicate(restored)

    # -- loops ------------------------------------------------------------
    def train_one_epoch(self, state, batches: Iterable, epoch: int, rng):
        """Reference train_one_epoch (topdown_trainer.py:68-87)."""
        agg, n = {}, 0
        for i, batch in enumerate(batches):
            rng, sub = jax.random.split(rng)
            batch = globalize_batch(batch, self.mesh)
            state, metrics = self.train_step(state, batch, sub)
            n += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
        agg = {k: float(v) / max(n, 1) for k, v in agg.items()}
        self.logger.log(epoch, agg, prefix="train/")
        self.logger.log(
            epoch, {"lr": float(self.schedule(int(state.step)))}
        )
        return state, agg, rng

    def val_one_epoch(self, state, batches: Iterable, epoch: int):
        """Reference val_one_epoch (topdown_trainer.py:26-41): loss-only."""
        agg, n = {}, 0
        for batch in batches:
            batch = globalize_batch(batch, self.mesh)
            _, metrics = self.eval_step(state, batch)
            n += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
        agg = {k: float(v) / max(n, 1) for k, v in agg.items()}
        self.logger.log(epoch, agg, prefix="val/")
        return agg

    def fit(
        self,
        state: TrainState,
        train_batches: Callable[[int], Iterable],
        val_batches: Optional[Callable[[], Iterable]] = None,
        seed: int = 0,
    ) -> TrainState:
        cfg = self.cfg
        total_epochs = int(cfg.TRAIN.get("total_epoches", 1))
        eval_interval = int(cfg.EVAL.get("interval", 1)) if "EVAL" in cfg else 1
        ckpt_interval = int(cfg.CHECKPOINT.get("interval", 10))
        rng = jax.random.PRNGKey(seed + 1234)

        state = self.maybe_resume(state)
        for epoch in range(self.start_epoch, total_epochs):
            t0 = time.time()
            state, train_metrics, rng = self.train_one_epoch(
                state, train_batches(epoch), epoch, rng
            )
            msg = (
                f"epoch {epoch}: train_loss={train_metrics.get('loss', np.nan):.5f}"
                f" ({time.time() - t0:.1f}s)"
            )
            # reference cadence (dist_train.py:181): epoch % interval == 0,
            # which includes the FIRST epoch of the run
            if val_batches is not None and epoch % eval_interval == 0:
                val_metrics = self.val_one_epoch(state, val_batches(), epoch)
                # reference gates on the criterion's total (dist_train.py:208
                # `val_loss_dict['sum']`), which is our "loss" entry; summing
                # components instead would double-count any unweighted
                # diagnostic a criterion chooses to report
                val_loss = val_metrics.get("loss", np.nan)
                msg += f" val_loss={val_loss:.5f}"
                # NOT chief-gated: orbax save is a cross-process barrier
                # (every process must enter; orbax elects the writer). The
                # gate value is the pmean'ed val loss, identical on every
                # process, so all processes take the same branch.
                # `<=` like the reference (dist_train.py:209 saves on ties)
                if val_loss <= self.min_val_loss:
                    self.min_val_loss = val_loss
                    self.ckpt.save(state, epoch, self.min_val_loss, best=True)
            # periodic save + an unconditional final-epoch save
            # (dist_train.py:224-225)
            if epoch % ckpt_interval == 0 or epoch == total_epochs - 1:
                self.ckpt.save(state, epoch, self.min_val_loss)
            if is_chief():
                print(msg, flush=True)
        return state


def _to_local(batch, n):
    return {
        k: (np.asarray(v)[:n] if hasattr(v, "shape") else v)
        for k, v in batch.items()
    }
