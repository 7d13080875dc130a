"""Train state: a single pytree carrying model params, BN stats, criterion
params, and optimizer state.

The criterion's own trainable params (SimDR decoders, MTL weights) join the
optimized tree — the functional analogue of the reference appending criterion
parameters to the optimizer (train/optimizer_scheduler.py:8-10).
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any          # model params
    batch_stats: Any     # model BN running stats
    crit_params: Any     # criterion params ({} if the criterion is stateless)
    opt_state: Any
    # optional DynamicLossScaler (train/precision.py) for fp16-style runs;
    # None (the default) is the bf16 path — no scaling machinery traced
    loss_scaler: Any = None

    @classmethod
    def create(cls, model_variables: Mapping, crit_variables: Mapping,
               tx: optax.GradientTransformation, loss_scaler: Any = None):
        params = model_variables["params"]
        batch_stats = model_variables.get("batch_stats", {})
        crit_params = (
            crit_variables.get("params", {}) if crit_variables else {}
        )
        opt_state = tx.init({"model": params, "crit": crit_params})
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            crit_params=crit_params,
            opt_state=opt_state,
            loss_scaler=loss_scaler,
        )
