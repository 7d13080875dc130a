"""k-means hand-size clustering for size-stratified eval splits.

Reference: utils/k_means.py:7-75 — 2-cluster split of bbox max-side sizes
used to build small/middle/large FreiHAND test subsets
(split_testset/freihand_20/*.json).
"""

from __future__ import annotations

import numpy as np


def kmeans_1d(values: np.ndarray, k: int = 2, iters: int = 100, seed: int = 0):
    """1-D k-means. Returns (centers [k], labels [N])."""
    values = np.asarray(values, np.float64).reshape(-1)
    rng = np.random.RandomState(seed)
    centers = np.sort(rng.choice(values, size=k, replace=False))
    labels = np.zeros(len(values), np.int64)
    for _ in range(iters):
        dists = np.abs(values[:, None] - centers[None, :])
        new_labels = dists.argmin(axis=1)
        if (new_labels == labels).all():
            break
        labels = new_labels
        for j in range(k):
            sel = values[labels == j]
            if len(sel):
                centers[j] = sel.mean()
    order = np.argsort(centers)
    remap = np.empty_like(order)
    remap[order] = np.arange(k)
    return centers[order], remap[labels]


def split_by_size(db, k: int = 2):
    """Cluster dataset records by bbox max-side; returns index lists per
    cluster (smallest first), the reference's small/large analysis."""
    sizes = np.array([max(rec["bbox"][2], rec["bbox"][3]) for rec in db])
    _, labels = kmeans_1d(sizes, k=k)
    return [np.where(labels == j)[0].tolist() for j in range(k)]
