"""Data-parallel runtime over a `jax.sharding.Mesh`.

TPU-native replacement for the reference's NCCL DDP stack
(train/spawn_dist.py, train/distributed_utils.py):

* one 1-D ``data`` mesh axis instead of one process per GPU;
* the train step runs under ``shard_map``: the batch is sharded over the
  axis, params are replicated, and gradients are ``pmean``-ed over ICI —
  the XLA-collective analogue of DDP's bucketed NCCL all-reduce;
* SyncBN (spawn_dist.py:37-38) is BatchNorm with ``axis_name='data'``:
  batch statistics are cross-device means inside the same step, no separate
  wrapper needed; without it, updated running stats are still averaged
  across replicas so the state stays replicated (DDP keeps rank-0's);
* multi-host setup is ``jax.distributed.initialize`` + per-process data
  sharding; ``jax.process_index() == 0`` replaces ``rank == 0`` gating;
* bf16 replaces the fp16 master-weights/loss-scale machinery
  (train/fp16_utils/) — params stay f32, compute can run bf16, no overflow
  handling needed on TPU.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from litehandnet_tpu.train.state import TrainState

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate_spec():
    return P()


def batch_spec(axis: str = DATA_AXIS):
    return P(axis)


def make_train_step(
    model,
    criterion,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    donate: bool = True,
    remat: Optional[bool] = None,
) -> Callable:
    """Build the jitted DP train step.

    Returns ``train_step(state, batch, rng) -> (state, metrics)`` where
    ``batch`` is a dict of arrays with a leading global batch dimension
    (sharded over the mesh axis) and metrics are replicated scalars.

    ``remat=True`` (or env ``LHN_REMAT=1``) rematerializes the train-mode
    forward during the backward pass (``jax.checkpoint``), trading one
    extra forward of FLOPs for not keeping every branch activation live —
    the standard lever when a larger per-chip batch would otherwise spill
    HBM (measured A/B in PROFILE.md §train-r4).
    """
    if remat is None:
        remat = os.environ.get("LHN_REMAT", "0") == "1"

    single_device = int(np.prod(mesh.devices.shape)) == 1

    def per_device_step(state: TrainState, batch, rng):
        if not single_device:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        scaler = state.loss_scaler

        def loss_fn(trainable):
            variables = {"params": trainable["model"]}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            def apply_model(variables, img, rng):
                return model.apply(
                    variables,
                    img,
                    train=True,
                    mutable=mutable,
                    rngs={"dropout": rng},
                )

            if remat:
                apply_model = jax.checkpoint(apply_model)
            out = apply_model(variables, batch["img"], rng)
            if mutable:
                out, mutated = out
                new_stats = mutated["batch_stats"]
            else:
                new_stats = state.batch_stats
            crit_vars = (
                {"params": trainable["crit"]} if state.crit_params else {}
            )
            loss, loss_dict = criterion.apply(crit_vars, out, batch)
            # optional fp16-style loss scaling (reference fp16_optimizer.py):
            # grads come back scaled and are unscaled below; the reported
            # loss stays raw
            grad_loss = loss if scaler is None else scaler.scale_loss(loss)
            return grad_loss, (loss, new_stats, loss_dict)

        trainable = {"model": state.params, "crit": state.crit_params}
        (_, (loss, new_stats, loss_dict)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        if scaler is not None:
            grads = scaler.unscale(grads)

        # DDP semantics: average gradients (and logged losses) across the
        # data axis; keep BN running stats replicated. Degenerate on a
        # single device (no collectives).
        if not single_device:
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            loss_dict = jax.lax.pmean(loss_dict, axis)
            new_stats = jax.lax.pmean(new_stats, axis)

        updates, new_opt_state = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_scaler = None
        if scaler is not None:
            # overflow-skip (reference fp16_optimizer.py:336-489): on any
            # non-finite gradient keep params/opt-state and halve the scale
            new_scaler, finite = scaler.update(grads)

            def keep_if_finite(new, old):
                return jax.tree.map(
                    lambda n, o: jnp.where(finite, n, o), new, old
                )

            new_trainable = keep_if_finite(new_trainable, trainable)
            new_opt_state = keep_if_finite(new_opt_state, state.opt_state)
            # an overflowing forward also produces non-finite BN batch
            # statistics — committing them would poison the running EMAs
            # permanently while claiming the step was "skipped"
            new_stats = keep_if_finite(new_stats, state.batch_stats)
        new_state = state.replace(
            step=state.step + 1,
            params=new_trainable["model"],
            crit_params=new_trainable["crit"],
            batch_stats=new_stats,
            opt_state=new_opt_state,
            loss_scaler=new_scaler,
        )
        metrics = dict(loss=loss, **loss_dict)
        return new_state, metrics

    if single_device:
        # Plain jit: shard_map adds nothing at mesh size 1 and (on some
        # runtimes, e.g. the axon remote-TPU tunnel) executes SPMD programs
        # through a far slower path (measured 10.9 s vs 37 ms per step).
        # NOTE: build the model with axis_name=None for this path.
        return jax.jit(
            per_device_step, donate_argnums=(0,) if donate else ()
        )
    sharded = shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_eval_step(model, criterion, mesh: Mesh, axis: str = DATA_AXIS):
    """Jitted DP validation step: eval-mode forward + loss (reference
    val_one_epoch, train/topdown_trainer.py:26-41). Returns (outputs, metrics);
    outputs stay sharded over the axis."""

    single_device = int(np.prod(mesh.devices.shape)) == 1

    def per_device(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, batch["img"], train=False)
        crit_vars = {"params": state.crit_params} if state.crit_params else {}
        loss, loss_dict = criterion.apply(crit_vars, out, batch)
        if single_device:
            return out, dict(loss=loss, **loss_dict)
        metrics = dict(loss=jax.lax.pmean(loss, axis))
        metrics.update(jax.lax.pmean(loss_dict, axis))
        return out, metrics

    if single_device:
        return jax.jit(per_device)

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def globalize_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Assemble each process's LOCAL batch shard into global ``jax.Array``s
    sharded over the mesh's data axis.

    Multi-controller JAX requires every process to hand jit the same GLOBAL
    array; ``jax.make_array_from_process_local_data`` stitches the local
    rows (this process's loader shard, ``data/loader.py`` per-process
    indices) into it without any cross-host transfer. Identity when running
    single-process — the common case keeps zero overhead. The reference has
    no analogue: DDP ranks each run their own process-local step
    (train/spawn_dist.py), while here one logical program spans hosts.
    """
    if jax.process_count() == 1:
        return batch
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(axis))
    return {k: _to_global(v, sharding) for k, v in batch.items()}


def _to_global(v, sharding):
    """Stitch one batch entry's process-local rows into a global array.

    Multi-scale configs (srhandnet) carry LISTS of per-scale arrays
    (device_pipeline.py) — each element is globalized, or the step would
    mix a global img with process-local targets."""
    if isinstance(v, (list, tuple)):
        return type(v)(_to_global(e, sharding) for e in v)
    if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(v)
        )
    return v


_multihost_initialized = False


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host bring-up (`jax.distributed.initialize`), the DCN analogue of
    the reference's tcp:// / env:// / SLURM rendezvous
    (train/distributed_utils.py:7-29). No-op when no coordinator is given.

    MUST run before any other jax API touches the backend, so the guard is a
    module flag — calling jax.process_count() here would initialize the local
    backend and poison the subsequent jax.distributed.initialize.
    """
    global _multihost_initialized
    if coordinator is None or _multihost_initialized:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _multihost_initialized = True


def is_chief() -> bool:
    """Replaces ``rank == 0`` gating."""
    return jax.process_index() == 0
