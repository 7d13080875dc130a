"""Profiling and determinism helpers.

The reference had only offline benchmarking (thop/torchstat/FPS loops,
SURVEY.md §5.1) and seed controls (utils/training_kits.py:12-31); here the
TPU-native equivalents: `jax.profiler` trace capture, XLA cost analysis, and
deterministic seeding.
"""

from __future__ import annotations

import contextlib
import os
import random
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args) -> dict:
    """FLOPs / bytes-accessed estimate for a jittable fn via XLA."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return dict(cost)


def set_seeds(seed: int = 0, rank_offset: Optional[int] = None) -> int:
    """Deterministic seeding (reference: training_kits.py:12-31 +
    per-rank offsets, distributed_utils.py:23). Returns the effective seed
    to use for `jax.random.PRNGKey`."""
    import jax

    if rank_offset is None:
        rank_offset = jax.process_index()
    effective = seed + 1 + rank_offset
    random.seed(effective)
    np.random.seed(effective)
    return effective


def parameter_histograms(params, bins: int = 50) -> dict:
    """Per-layer parameter histograms (reference: utils/weight_analysis.py)."""
    import jax

    out = {}
    from litehandnet_tpu.utils.tree import keypath_name

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = keypath_name(path)
        arr = np.asarray(leaf).ravel()
        hist, edges = np.histogram(arr, bins=bins)
        out[name] = dict(
            hist=hist.tolist(),
            edges=edges.tolist(),
            mean=float(arr.mean()),
            std=float(arr.std()),
        )
    return out
