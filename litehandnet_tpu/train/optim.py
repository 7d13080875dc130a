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
from typing import NamedTuple, Sequence

import chex
import jax
import jax.numpy as jnp
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
    use_cosine = optimizer_type.lower() in ("sgd", "adai", "adaiw")

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


class ScaleByAdaiState(NamedTuple):
    count: chex.Array      # []
    exp_avg: chex.PyTree   # momentum m_t
    exp_avg_sq: chex.PyTree  # second moment v_t
    beta1_prod: chex.PyTree  # running product of the adaptive beta1


def scale_by_adai(
    beta0: float = 0.1,
    beta2: float = 0.99,
    eps: float = 1e-3,
) -> optax.GradientTransformation:
    """Adai: adaptive-inertia SGD (Xie et al., ICML 2022).

    The reference's optimizer factory selects
    ``Adai(params, lr, betas=(0.1, 0.99), eps=1e-3, weight_decay=1e-8)``
    (train/optimizer_scheduler.py:19-24) — but its ``from train import
    adai_optim`` module is absent from the repository (SURVEY §2.6:
    broken import as shipped), so this follows the published algorithm:
    per-element second moments normalize each parameter's inertia
    ``beta1 = clip(1 - beta0 * v_hat / mean(v_hat), 0, 1-eps)`` where the
    mean runs over EVERY parameter element in the network, and the update
    is the bias-corrected momentum (no adaptive learning-rate division).
    """

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        ones = jax.tree.map(jnp.ones_like, params)
        return ScaleByAdaiState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=zeros,
            beta1_prod=ones,
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        v = jax.tree.map(
            lambda vi, g: beta2 * vi + (1.0 - beta2) * (g * g),
            state.exp_avg_sq, updates,
        )
        bias2 = 1.0 - beta2 ** count.astype(jnp.float32)
        v_hat = jax.tree.map(lambda vi: vi / bias2, v)
        # global mean of v_hat across all parameter elements
        total = sum(x.size for x in jax.tree.leaves(v_hat))
        v_mean = (
            sum(jnp.sum(x) for x in jax.tree.leaves(v_hat)) / total
        )
        beta1 = jax.tree.map(
            lambda vh: jnp.clip(1.0 - beta0 * vh / v_mean, 0.0, 1.0 - eps),
            v_hat,
        )
        m = jax.tree.map(
            lambda mi, b1, g: b1 * mi + (1.0 - b1) * g,
            state.exp_avg, beta1, updates,
        )
        b1p = jax.tree.map(lambda p, b1: p * b1, state.beta1_prod, beta1)
        m_hat = jax.tree.map(lambda mi, p: mi / (1.0 - p), m, b1p)
        return m_hat, ScaleByAdaiState(
            count=count, exp_avg=m, exp_avg_sq=v, beta1_prod=b1p
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adai(
    learning_rate: optax.ScalarOrSchedule,
    beta0: float = 0.1,
    beta2: float = 0.99,
    eps: float = 1e-3,
    weight_decay: float = 1e-8,
    decoupled: bool = False,
) -> optax.GradientTransformation:
    """Adai / AdaiW with the reference factory's hyper-parameters.

    ``decoupled=False`` (Adai) applies L2 decay to the gradients before the
    inertia statistics; ``decoupled=True`` (AdaiW) applies the decay to the
    parameters alongside the scaled update.
    """
    stats = scale_by_adai(beta0=beta0, beta2=beta2, eps=eps)
    decay = optax.add_decayed_weights(weight_decay)
    lr = optax.scale_by_learning_rate(learning_rate)
    if decoupled:
        return optax.chain(stats, decay, lr)
    return optax.chain(decay, stats, lr)


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
    if name in ("adai", "adaiw"):
        # reference factory hyper-params (optimizer_scheduler.py:19-24)
        return adai(schedule, decoupled=(name == "adaiw"))
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
