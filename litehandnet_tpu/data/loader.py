"""Host-side data loading: JPEG decode into a fixed canvas, per-process
sharding, batching; the rest of preprocessing runs on device.

Replaces the reference's torch DataLoader + DistributedSampler stack
(datasets/dataloader.py:7-55): indices are sharded across jax processes
(the DistributedSampler analogue), shuffled per epoch from a seeded rng
(per-rank seeds, train/distributed_utils.py:23), images are decoded by a
thread pool, and each batch is a dict of stacked numpy arrays ready for the
fused device pipeline.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, Optional

import jax
import numpy as np

from litehandnet_tpu.data import build_dataset
from litehandnet_tpu.data.device_pipeline import DevicePipeline


def _load_image(path: str, canvas_hw):
    """Decode an image into a zero-padded uint8 canvas [H0, W0, 3] (RGB)."""
    from PIL import Image

    H0, W0 = canvas_hw
    canvas = np.zeros((H0, W0, 3), np.uint8)
    try:
        with Image.open(path) as im:
            im = im.convert("RGB")
            arr = np.asarray(im, np.uint8)
    except (FileNotFoundError, OSError):
        return canvas
    h = min(arr.shape[0], H0)
    w = min(arr.shape[1], W0)
    canvas[:h, :w] = arr[:h, :w]
    return canvas


class DataLoader:
    """Iterates batches of (host canvas images + metadata), optionally pushed
    through the fused on-device pipeline.

    Args:
        cfg: experiment config.
        data_type: 'train' | 'val' | 'test'.
        batch_size: GLOBAL batch size (cfg.TRAIN.batch_per_gpu x devices when
            None).
        canvas_hw: static (H0, W0) decode canvas; defaults to the dataset's
            input size x2 (top-down sources are larger than the crop).
        use_device_pipeline: run augmentation/encoding on device and yield
            train-ready batches; otherwise yield raw metadata batches.
    """

    def __init__(
        self,
        cfg,
        data_type: str = "train",
        batch_size: Optional[int] = None,
        canvas_hw=None,
        use_device_pipeline: bool = True,
        num_workers: int = 8,
        drop_last: Optional[bool] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.data_type = data_type
        self.dataset = build_dataset(
            cfg, data_type, rng=np.random.RandomState(seed)
        )
        if batch_size is None:
            batch_size = int(cfg.TRAIN.batch_per_gpu) * jax.local_device_count()
        self.batch_size = batch_size
        self.is_train = data_type == "train"
        self.drop_last = self.is_train if drop_last is None else drop_last
        self.seed = seed
        if canvas_hw is None:
            w, h = cfg.DATASET.image_size
            canvas_hw = (int(h) * 2, int(w) * 2)
        self.canvas_hw = tuple(canvas_hw)
        self.num_workers = num_workers
        self.pipeline = None
        if use_device_pipeline:
            self.pipeline = DevicePipeline(
                cfg, self.dataset.ann_info["flip_index"], is_train=self.is_train
            )
        # per-process shard (DistributedSampler analogue)
        n = len(self.dataset)
        proc, nproc = jax.process_index(), jax.process_count()
        self.local_indices = np.arange(proc, n, nproc)

    def __len__(self):
        n = len(self.local_indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _raw_batch(self, idxs, pool):
        records = [self.dataset.db[i] for i in idxs]
        K = self.dataset.ann_info["num_joints"]
        images = list(
            pool.map(
                lambda r: _load_image(r["image_file"], self.canvas_hw), records
            )
        )
        batch = {
            "img_raw": np.stack(images),
            "joints": np.stack(
                [r["joints_3d"][:, :2].astype(np.float32) for r in records]
            ),
            "vis": np.stack(
                [r["joints_3d_visible"][:, 0].astype(np.float32) for r in records]
            ),
            "center": np.stack([np.asarray(r["center"], np.float32) for r in records]),
            "scale": np.stack([np.asarray(r["scale"], np.float32) for r in records]),
            "rotation": np.zeros(len(records), np.float32),
            "bbox": np.stack([
                np.asarray(r.get("bbox", [0, 0, 0, 0]), np.float32)[:4]
                for r in records
            ]),
            "image_file": [r["image_file"] for r in records],
            "bbox_id": np.asarray([r.get("bbox_id", i) for i, r in enumerate(records)]),
            "bbox_score": np.asarray(
                [r.get("bbox_score", 1.0) for r in records], np.float32
            ),
        }
        return batch

    def batches(self, epoch: int = 0) -> Iterator[dict]:
        rng = np.random.RandomState(self.seed + epoch)
        idxs = self.local_indices.copy()
        if self.is_train:
            rng.shuffle(idxs)
        key = jax.random.PRNGKey(self.seed * 100003 + epoch)
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start:start + self.batch_size]
                if len(chunk) < self.batch_size:
                    if self.drop_last:
                        break
                    # pad to static batch size (repeat last records)
                    pad = self.batch_size - len(chunk)
                    chunk = np.concatenate([chunk, chunk[-1:].repeat(pad)])
                raw = self._raw_batch(chunk, pool)
                if self.pipeline is None:
                    yield raw
                    continue
                key, sub = jax.random.split(key)
                out = self.pipeline(
                    raw["img_raw"], raw["joints"], raw["vis"], raw["center"],
                    raw["scale"], raw["rotation"], sub, bboxes=raw["bbox"],
                )
                batch = dict(out)
                batch["img_raw"] = raw["img_raw"]
                batch["joints_src"] = raw["joints"]
                batch["vis_src"] = raw["vis"]
                batch["bbox"] = raw["bbox"]
                batch["image_file"] = raw["image_file"]
                batch["bbox_id"] = raw["bbox_id"]
                batch["bbox_score"] = raw["bbox_score"]
                yield batch

    def __iter__(self):
        return self.batches(0)


def make_dataloader(cfg, data_type="train", **kw):
    """Reference-surface factory (datasets/dataloader.py:7-55)."""
    loader = DataLoader(cfg, data_type, **kw)
    return loader.dataset, loader
