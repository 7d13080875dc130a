"""Mixed-precision policy.

Replaces the reference's apex-derived fp16 stack (train/fp16_utils/: master
fp32 weights, gradient copy/unscale, overflow-skip, DynamicLossScaler) with
the TPU-native bf16 recipe: parameters and optimizer state stay float32,
activations/matmuls run bfloat16 via the models' ``dtype`` argument, and the
head casts back to float32. bf16 shares float32's exponent range, so no loss
scaling or overflow machinery is needed (SURVEY.md §2.8).

``DynamicLossScaler`` is still provided for API parity (and for running the
same code on hardware where float16 is preferable); it is a pure pytree so
it jits.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


def cast_to_compute(tree: Any, dtype=jnp.bfloat16):
    """Cast floating-point leaves to the compute dtype."""
    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x
    return jax.tree.map(cast, tree)


def cast_to_param(tree: Any, dtype=jnp.float32):
    return cast_to_compute(tree, dtype)


@flax.struct.dataclass
class DynamicLossScaler:
    """Dynamic loss scaling (reference: train/fp16_utils/loss_scaler.py:81-212):
    scale doubles after `window` consecutive finite steps and halves on
    overflow."""

    scale: jax.Array
    good_steps: jax.Array
    window: int = 1000
    factor: float = 2.0

    @classmethod
    def create(cls, init_scale: float = 2.0**15, window: int = 1000):
        return cls(
            scale=jnp.float32(init_scale),
            good_steps=jnp.zeros((), jnp.int32),
            window=window,
        )

    def scale_loss(self, loss):
        return loss * self.scale

    def unscale(self, grads):
        return jax.tree.map(lambda g: g / self.scale, grads)

    def update(self, grads):
        """Returns (new_scaler, grads_finite). Apply updates only when
        finite (the reference's overflow-skip, fp16_optimizer.py:336-489)."""
        finite = jnp.all(
            jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
            )
        )
        grew = self.good_steps + 1 >= self.window
        new_scale = jnp.where(
            finite,
            jnp.where(grew, self.scale * self.factor, self.scale),
            jnp.maximum(self.scale / self.factor, 1.0),
        )
        new_steps = jnp.where(
            finite & ~grew, self.good_steps + 1, jnp.zeros((), jnp.int32)
        )
        return self.replace(scale=new_scale, good_steps=new_steps), finite
