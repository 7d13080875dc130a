"""Unit tests for the fuzzy checkpoint loader, the per-process shard
padding, and the shared key-path helper."""

import numpy as np
import jax
import pytest


def test_fuzzy_loader_reserves_exact_matches_first():
    """An earlier leaf's shape-fallback must not steal a source leaf that
    exactly names a later target leaf (reference load_pretrained_state,
    training_kits.py:33-52, matches by shape in order — the exact-name
    pass here is the stronger contract this port documents)."""
    from litehandnet_tpu.utils.checkpoint_compat import load_pretrained_state

    trained_b = np.arange(3.0)
    target = {"a": np.zeros(3), "b": np.zeros(3)}
    new, full = load_pretrained_state(target, {"b": trained_b})
    np.testing.assert_array_equal(new["b"], trained_b)
    # 'a' has no exact match and the only shape-(3,) source is reserved
    np.testing.assert_array_equal(new["a"], np.zeros(3))
    assert not full

    # pure shape-fallback still works when no exact names match
    new2, full2 = load_pretrained_state(
        {"x": np.zeros(3)}, {"renamed": trained_b}
    )
    np.testing.assert_array_equal(new2["x"], trained_b)
    assert full2


def test_keypath_name_handles_sequence_keys():
    """List-indexed pytree entries must not collapse into colliding names
    (SequenceKey has .idx, not .key)."""
    from litehandnet_tpu.utils.tree import keypath_name

    tree = {"scales": [np.zeros(1), np.ones(1)]}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    names = [keypath_name(p) for p, _ in flat]
    assert len(set(names)) == 2, names
    assert names[0] != names[1]


def test_loader_shards_are_equal_sized(monkeypatch):
    """Per-process shards must be padded to equal length (the torch
    DistributedSampler semantics): unequal shards would let one process
    dispatch a pmean collective the others never join, and would bake
    different steps_per_epoch (= LR schedules) into each process."""
    from litehandnet_tpu.data import loader as loader_mod

    n, nproc = 119, 2
    sizes, unions = [], []
    for proc in (0, 1):
        per_proc = -(-n // nproc)
        padded = np.resize(np.arange(n), per_proc * nproc)
        local = padded[proc::nproc]
        sizes.append(len(local))
        unions.append(local)
    assert sizes[0] == sizes[1] == 60
    covered = np.unique(np.concatenate(unions))
    np.testing.assert_array_equal(covered, np.arange(n))

    # and through the real DataLoader: fake a 2-process world
    import json

    from PIL import Image

    import tempfile, os

    with tempfile.TemporaryDirectory() as root:
        images, annotations = [], []
        for i in range(5):  # odd count: naive striding would give 3 vs 2
            arr = np.zeros((32, 32, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(root, f"{i}.jpg"))
            images.append(dict(id=i, file_name=f"{i}.jpg", width=32,
                               height=32))
            annotations.append(dict(
                id=i, image_id=i, category_id=1, iscrowd=0,
                keypoints=[8.0, 8.0, 1] * 21,
                bbox=[4.0, 4.0, 24.0, 24.0], area=576.0,
            ))
        ann = os.path.join(root, "ann.json")
        with open(ann, "w") as f:
            json.dump(dict(images=images, annotations=annotations,
                           categories=[dict(id=1, name="hand")]), f)

        from litehandnet_tpu.config import config_from_dict

        cfg = config_from_dict(dict(
            MODEL=dict(name="litehandnet", output_channel=21),
            DATASET=dict(
                name="freihand", num_joints=21, image_size=[32, 32],
                heatmap_size=[8, 8],
                test=dict(ann_file=ann, img_prefix=root + os.sep),
            ),
            PIPELINE=dict(flip_prob=0, rot_prob=0, scale_factor=0, sigma=2,
                          encoding="MSRA"),
            TRAIN=dict(batch_per_gpu=2),
            EVAL=dict(metric=["PCK"]),
        ))
        lens = []
        for proc in (0, 1):
            monkeypatch.setattr(jax, "process_index", lambda p=proc: p)
            monkeypatch.setattr(jax, "process_count", lambda: 2)
            dl = loader_mod.DataLoader(
                cfg, "test", batch_size=2, use_device_pipeline=False,
                drop_last=False,
            )
            lens.append(len(dl.local_indices))
        assert lens[0] == lens[1] == 3
