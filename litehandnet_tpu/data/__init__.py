"""Data layer: COCO-format datasets, metadata, host loader, fused on-device
augmentation + target encoding.

Dataset registry mirrors the reference name mapping
(datasets/datasets/__init__.py:1-17 + build_dataset.py:97-146).
"""

from __future__ import annotations

from litehandnet_tpu.data.dataset_info import DATASET_INFOS, DatasetInfo  # noqa: F401


_DATASETS = {
    "freihand": ("litehandnet_tpu.data.hand", "FreiHandDataset"),
    "rhd": ("litehandnet_tpu.data.hand", "RHD2dDataset"),
    "rhd2d": ("litehandnet_tpu.data.hand", "RHD2dDataset"),
    "onehand10k": ("litehandnet_tpu.data.hand", "OneHand10KDataset"),
    "panoptic": ("litehandnet_tpu.data.hand", "PanopticDataset"),
    "panoptic_hand2d": ("litehandnet_tpu.data.hand", "PanopticDataset"),
    "coco_wholebody_hand": (
        "litehandnet_tpu.data.hand", "CocoWholeBodyHandDataset"
    ),
    "zhhand": ("litehandnet_tpu.data.hand", "ZHHandDataset"),
    "coco": ("litehandnet_tpu.data.body", "TopDownCocoDataset"),
    "mpii": ("litehandnet_tpu.data.body", "TopDownMpiiDataset"),
    "mpii_action": ("litehandnet_tpu.data.body", "TopDownMpiiActionDataset"),
}


def dataset_names():
    return sorted(_DATASETS)


def get_dataset_class(name: str):
    import importlib

    if name not in _DATASETS:
        raise KeyError(f"unknown dataset {name!r}; available: {dataset_names()}")
    module, attr = _DATASETS[name]
    return getattr(importlib.import_module(module), attr)


def build_dataset(cfg, data_type: str = "train", rng=None):
    """Build a dataset from an experiment config (reference:
    datasets/build_dataset.py:97-146)."""
    cls = get_dataset_class(cfg.DATASET.name.lower())
    return cls(cfg.DATASET, data_type=data_type, rng=rng)
