"""Weight initializers (reference surface: models/weight_init.py:3-32).

Flax initializes at `model.init` time, so these are initializer factories
(and a tree-level re-init helper) rather than in-place module mutators.
"""

from __future__ import annotations

import jax
from flax import linen as nn

kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
normal_init = nn.initializers.normal(stddev=0.001)


def constant_init(value: float = 1.0):
    return nn.initializers.constant(value)


def reinit_params(params, rng_key, init=normal_init):
    """Re-draw every kernel leaf with `init`, zero biases/scales untouched."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    leaves = []
    key = rng_key
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name == "kernel":
            key, sub = jax.random.split(key)
            leaves.append(init(sub, leaf.shape, leaf.dtype))
        else:
            leaves.append(leaf)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)
