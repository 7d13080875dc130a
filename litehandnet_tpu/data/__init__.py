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


class ConcatDataset:
    """Concatenation of multiple datasets (reference: the vendored
    ConcatDataset at datasets/build_dataset.py:15-95 — which the reference
    then never actually uses, returning only the last dataset at :146; this
    one works)."""

    def __init__(self, datasets):
        assert datasets, "ConcatDataset needs at least one dataset"
        self.datasets = list(datasets)
        self.cumulative_sizes = []
        total = 0
        for d in self.datasets:
            total += len(d)
            self.cumulative_sizes.append(total)
        # shared surface with Kpt2dDataset
        first = self.datasets[0]
        self.ann_info = first.ann_info
        self.dataset_name = "+".join(d.dataset_name for d in self.datasets)

    def __len__(self):
        return self.cumulative_sizes[-1] if self.cumulative_sizes else 0

    def _locate(self, idx):
        import bisect

        if idx < 0:
            idx += len(self)
        di = bisect.bisect_right(self.cumulative_sizes, idx)
        start = 0 if di == 0 else self.cumulative_sizes[di - 1]
        return di, idx - start

    def __getitem__(self, idx):
        di, li = self._locate(idx)
        return self.datasets[di][li]

    @property
    def db(self):
        out = []
        for d in self.datasets:
            out.extend(d.db)
        return out


def build_concat_dataset(cfgs, data_type="train", rng=None):
    """Build a multi-dataset union from several experiment configs."""
    return ConcatDataset([build_dataset(c, data_type, rng=rng) for c in cfgs])
