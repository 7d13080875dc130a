"""Optimizer and LR-schedule factories (optax).

Mirrors the reference factories (train/optimizer_scheduler.py:7-44):
* SGD(momentum 0.9, weight decay 1e-8) / Adam / any optax optimizer by name;
* linear warmup over ``warmup_steps`` mini-batches
  (train/topdown_trainer.py:43-66);
* cosine-annealing-with-warm-restarts (T_0=10 epochs, T_mult=2) for SGD,
  MultiStepLR(step_epoch, gamma 0.1) otherwise.

Schedules are per-step (optax convention); epoch-based reference schedules are
converted with ``steps_per_epoch``.
"""

from __future__ import annotations

import math
from typing import Sequence

import optax


def make_lr_schedule(
    base_lr: float,
    optimizer_type: str = "Adam",
    warmup_steps: int = 0,
    step_epoch: Sequence[int] = (170, 200),
    steps_per_epoch: int = 1000,
    total_epochs: int = 210,
) -> optax.Schedule:
    """Warmup + (cosine-warm-restarts | multi-step) schedule."""
    use_cosine = optimizer_type.lower() in ("sgd", "adai")

    if use_cosine:
        # CosineAnnealingWarmRestarts(T_0=10, T_mult=2), epoch granularity.
        schedules, boundaries = [], []
        t0, start = 10, 0
        while start < total_epochs:
            period_steps = t0 * steps_per_epoch
            schedules.append(
                optax.cosine_decay_schedule(base_lr, period_steps, alpha=0.0)
            )
            start += t0
            boundaries.append(start * steps_per_epoch)
            t0 *= 2
        main = optax.join_schedules(schedules, boundaries[:-1])
    else:
        boundaries_and_scales = {
            int(e) * steps_per_epoch: 0.1 for e in step_epoch
        }
        main = optax.piecewise_constant_schedule(base_lr, boundaries_and_scales)

    if warmup_steps > 0:
        # join_schedules shifts `main` by warmup_steps — deliberate: the
        # reference's warmup is a SEPARATE pre-epoch training pass
        # (topdown_trainer.py:43-66, called before the epoch loop at
        # dist_train.py:150-158), so its epoch-indexed decay boundaries are
        # likewise delayed by the warmup phase in optimizer-step terms
        warm = optax.linear_schedule(
            init_value=base_lr / max(warmup_steps, 1),
            end_value=base_lr,
            transition_steps=warmup_steps,
        )
        return optax.join_schedules([warm, main], [warmup_steps])
    return main


def make_optimizer(
    optimizer_type: str,
    schedule: optax.Schedule,
) -> optax.GradientTransformation:
    name = optimizer_type.lower()
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(1e-8),
            optax.sgd(schedule, momentum=0.9),
        )
    if name == "adam":
        return optax.adam(schedule)
    if name == "adamw":
        return optax.adamw(schedule)
    # any optax optimizer by name (reference uses eval over torch.optim)
    ctor = getattr(optax, name, None)
    if ctor is None:
        raise KeyError(f"unknown optimizer {optimizer_type!r}")
    return ctor(schedule)


def make_optimizer_from_config(cfg, steps_per_epoch: int, world_size: int = 1):
    """Build (optimizer, schedule) from cfg.OPTIMIZER / cfg.TRAIN.

    LR is scaled by world size as in the reference (dist_train.py:68).
    """
    opt = cfg.OPTIMIZER
    base_lr = float(opt.lr) * world_size
    schedule = make_lr_schedule(
        base_lr,
        optimizer_type=opt.type,
        warmup_steps=int(opt.get("warmup_steps", 0)),
        step_epoch=opt.get("step_epoch", [170, 200]),
        steps_per_epoch=steps_per_epoch,
        total_epochs=int(cfg.TRAIN.get("total_epoches", 210)),
    )
    return make_optimizer(opt.type, schedule), schedule
