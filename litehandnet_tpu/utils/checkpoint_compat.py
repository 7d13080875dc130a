"""Fuzzy checkpoint loading.

Reference: utils/training_kits.py:33-52 (`load_pretrained_state`) — loads a
checkpoint into a model even when keys were renamed/reordered, by matching
parameters with identical shapes in tree order. Used for porting checkpoints
between train/deploy graphs or across refactors.
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import jax
import numpy as np

from litehandnet_tpu.utils.tree import keypath_name


def _flatten(tree) -> list:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [(keypath_name(path), leaf) for path, leaf in leaves]


def load_pretrained_state(target: Any, source: Mapping) -> Tuple[Any, bool]:
    """Fill `target`'s leaves from `source`.

    Exact-name matches are RESERVED in a first pass (so an earlier leaf's
    shape-fallback can never steal a source leaf that exactly names a later
    target leaf); remaining leaves are then matched greedily by shape in
    tree order (the reference's fuzzy fallback).

    Returns:
        (new_target, fully_matched)
    """
    src_items = _flatten(source)
    src_by_name = dict(src_items)

    tgt_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    tgt_items = [(keypath_name(p), leaf) for p, leaf in tgt_paths]

    # pass 1: reserve every exact name+shape match
    used = {
        name
        for name, leaf in tgt_items
        if name in src_by_name
        and np.shape(src_by_name[name]) == np.shape(leaf)
    }

    new_leaves = []
    matched = 0
    for name, leaf in tgt_items:
        shape = np.shape(leaf)
        if name in used:
            new_leaves.append(src_by_name[name])
            matched += 1
            continue
        found = None
        for src_name, src_leaf in src_items:
            if src_name in used:
                continue
            if np.shape(src_leaf) == shape:
                found = (src_name, src_leaf)
                break
        if found is not None:
            used.add(found[0])
            new_leaves.append(found[1])
            matched += 1
        else:
            new_leaves.append(leaf)
    full = matched == len(tgt_items)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), full
