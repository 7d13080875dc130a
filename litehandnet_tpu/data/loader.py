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
from litehandnet_tpu import native


def _load_image(path: str, canvas_hw, center=None, scale=None, margin=1.1):
    """Decode an image into a zero-padded uint8 canvas [H0, W0, 3] (RGB).

    Sources larger than the canvas keep their ROI (reference semantics:
    full-image decode, datasets/loading.py:6-89): first a window around the
    bbox — sized to cover the crop box under maximum scale jitter and ANY
    rotation (half-diagonal bound) — is sliced out; if that window still
    exceeds the canvas it is downscaled to fit, at full quality via PIL
    bilinear. Geometry is returned so callers can remap annotations.

    Returns:
        (canvas, offset_xy, scale_xy): source-image coords map to canvas
        coords as ``(p - offset_xy) * scale_xy``.
    """
    H0, W0 = canvas_hw
    canvas = np.zeros((H0, W0, 3), np.uint8)
    offset = np.zeros(2, np.float32)
    fscale = np.ones(2, np.float32)
    arr = _decode_image(path)
    if arr is None:
        return canvas, offset, fscale
    h, w = arr.shape[:2]
    if (h > H0 or w > W0) and center is not None and scale is not None:
        wx, wy = np.asarray(scale, np.float32) * 200.0 * float(margin)
        half = float(np.hypot(wx, wy)) / 2.0 + 4.0
        x0 = max(int(np.floor(center[0] - half)), 0)
        y0 = max(int(np.floor(center[1] - half)), 0)
        x1 = min(int(np.ceil(center[0] + half)), w)
        y1 = min(int(np.ceil(center[1] + half)), h)
        if x1 > x0 and y1 > y0:
            arr = arr[y0:y1, x0:x1]
            offset = np.float32([x0, y0])
            h, w = arr.shape[:2]
    if h > H0 or w > W0:
        f = min(H0 / h, W0 / w)
        nw, nh = max(int(w * f), 1), max(int(h * f), 1)
        arr = _resize_u8(arr, nw, nh)
        fscale = np.float32([nw / w, nh / h])
        h, w = nh, nw
    canvas[:h, :w] = arr
    return canvas, offset, fscale


def _decode_image(path: str):
    """Decode RGB uint8 in STORED-pixel orientation; cv2 when available
    (faster and releases the GIL, so the thread pool actually parallelizes),
    PIL otherwise.

    Orientation convention (deliberate, reference semantics): the reference
    loads via mmcv.imfrombytes -> cv2.imdecode
    (datasets/data_pipeline/loading.py:38), which does NOT apply the EXIF
    Orientation tag — annotations are authored in stored-pixel space. So
    every decode path here (cv2, PIL, native libjpeg) stays in stored
    orientation: cv2.imread gets IMREAD_IGNORE_ORIENTATION (plain imread
    would rotate), PIL skips exif_transpose, and the native decoder needs
    no EXIF routing at all."""
    try:
        import cv2

        img = cv2.imread(
            path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION
        )
        if img is None:
            return None
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        pass
    from PIL import Image

    try:
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.uint8)
    except (FileNotFoundError, OSError):
        return None


def _resize_u8(arr, nw: int, nh: int):
    try:
        import cv2

        return cv2.resize(arr, (nw, nh), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image

        return np.asarray(
            Image.fromarray(arr).resize((nw, nh), Image.BILINEAR), np.uint8
        )


def prefetch_iter(gen, size: int = 2):
    """Run `gen` in a background thread, keeping up to `size` items ready —
    overlaps host JPEG decode with device compute (double buffering).

    Abandoning this iterator (break / exception / GC) shuts the worker
    down: the finally block sets `stop` and drains the queue so a blocked
    put() wakes up, and the worker closes `gen` so resources held inside
    it (the decode thread pool) are released rather than leaked."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    END = object()
    stop = threading.Event()

    def put(item) -> bool:
        """put() that gives up when the consumer has gone away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            try:
                for item in gen:
                    if not put(item):
                        return
                put(END)
            except BaseException as e:  # surface errors on the consumer side
                put(e)
        finally:
            gen.close()

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


class DataLoader:
    """Iterates batches of (host canvas images + metadata), optionally pushed
    through the fused on-device pipeline.

    Args:
        cfg: experiment config.
        data_type: 'train' | 'val' | 'test'.
        batch_size: PER-PROCESS batch size (cfg.TRAIN.batch_per_gpu x LOCAL
            devices when None). Each process yields its own shard;
            `train.distributed.globalize_batch` stitches the shards into
            the global array in multi-host runs.
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
        use_native: Optional[bool] = None,
        decode_procs: int = 0,
        sharding=None,
    ):
        self.cfg = cfg
        self.data_type = data_type
        # optional jax.sharding.Sharding for the device-pipeline inputs:
        # raw host batches are device_put with it before the fused jitted
        # pipeline runs, so the preprocessing (and anything downstream that
        # consumes batch["img"] in the same jit ecosystem) executes SPMD
        # over the mesh instead of on one device — the multi-device
        # serving/eval analogue of the reference's nn.DataParallel eval
        # wrap (test.py:81). Batch size must divide the sharded axis.
        self.sharding = sharding
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
        # ROI decode window must cover the crop box under the largest scale
        # jitter; rotation is covered by _load_image's half-diagonal bound
        sf = float(cfg.PIPELINE.get("scale_factor", 0)) if self.is_train else 0.0
        self.roi_margin = (1.0 + sf) * 1.05
        self.num_workers = num_workers
        self.use_native = (
            native.available() if use_native is None else bool(use_native)
        )
        self.pipeline = None
        if use_device_pipeline:
            self.pipeline = DevicePipeline(
                cfg, self.dataset.ann_info["flip_index"], is_train=self.is_train
            )
        # per-process shard (DistributedSampler analogue). Like torch's
        # DistributedSampler, the dataset is PADDED (wrapping around) so
        # every process holds exactly ceil(n/nproc) indices — unequal
        # shards would let one process dispatch a train step (a pmean
        # collective) the others never join, deadlocking multi-host runs,
        # and would bake different steps_per_epoch into each process's
        # LR schedule.
        n = len(self.dataset)
        proc, nproc = jax.process_index(), jax.process_count()
        per_proc = -(-n // nproc)
        padded = np.resize(np.arange(n), per_proc * nproc)  # wraps around
        self.local_indices = padded[proc::nproc]
        # optional process-sharded decode (reference torch DataLoader worker
        # processes, datasets/dataloader.py:7-55): N OS workers writing into
        # shared memory, lifting the host-Python/GIL ceiling on multi-core
        # TPU-VM hosts. 0 = in-process decode (native pthread pool / cv2).
        self.decode_pool = None
        if decode_procs > 0:
            from litehandnet_tpu.data.mp_decode import ProcessDecodePool

            self.decode_pool = ProcessDecodePool(
                decode_procs, self.batch_size, self.canvas_hw,
                roi_margin=self.roi_margin, use_native=self.use_native,
            )

    def close(self):
        """Release the decode worker processes + shared-memory block (a
        no-op without a pool). Scripts that build loaders per split/epoch
        should call this (or use the loader as a context manager) instead
        of waiting for interpreter GC."""
        if self.decode_pool is not None:
            self.decode_pool.close()
            self.decode_pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __len__(self):
        n = len(self.local_indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _decode_batch(self, records, pool):
        """Decode a batch of records into a stacked [N, H0, W0, 3] canvas
        array + geometry (one materialization — the canvases land stacked
        in every path, so the consumer never re-copies this ~tens-of-MB
        buffer on the host-bound loader thread).

        Fast path: the native C++ batched libjpeg-turbo ROI decoder
        (litehandnet_tpu/native). Any image it cannot handle (PNG, CMYK,
        progressive, IO error) falls back to the per-image cv2/PIL path with
        identical geometry semantics.
        """
        if self.decode_pool is not None:
            canv, off, fsc = self.decode_pool.decode(
                [r["image_file"] for r in records],
                np.stack([np.asarray(r["center"], np.float32)
                          for r in records]),
                np.stack([np.asarray(r["scale"], np.float32)
                          for r in records]),
            )
            # copy out of the shared block: prefetch_iter overlaps batches,
            # and the next decode() reuses the same memory
            return np.array(canv, copy=True), off, fsc
        if self.use_native:
            centers = np.stack(
                [np.asarray(r["center"], np.float32) for r in records]
            )
            wxy = np.stack(
                [np.asarray(r["scale"], np.float32) for r in records]
            ) * 200.0 * float(self.roi_margin)
            halves = np.hypot(wxy[:, 0], wxy[:, 1]) / 2.0 + 4.0
            canv, off, fsc, status = native.decode_roi_batch(
                [r["image_file"] for r in records], self.canvas_hw,
                centers, halves.astype(np.float32),
                n_threads=self.num_workers,
            )
            if (status == 0).all():
                return canv, off.astype(np.float32), fsc.astype(np.float32)
            for i in np.nonzero(status)[0]:
                r = records[i]
                canv[i], off[i], fsc[i] = _load_image(
                    r["image_file"], self.canvas_hw,
                    center=r["center"], scale=r["scale"],
                    margin=self.roi_margin,
                )
            return canv, off.astype(np.float32), fsc.astype(np.float32)
        loaded = list(
            pool.map(
                lambda r: _load_image(
                    r["image_file"], self.canvas_hw,
                    center=r["center"], scale=r["scale"],
                    margin=self.roi_margin,
                ),
                records,
            )
        )
        images = np.stack([im for im, _, _ in loaded])
        offset = np.stack([o for _, o, _ in loaded])
        fscale = np.stack([f for _, _, f in loaded])
        return images, offset, fscale

    def _raw_batch(self, idxs, pool):
        records = [self.dataset.db[i] for i in idxs]
        images, offset, fscale = self._decode_batch(records, pool)
        joints = np.stack(
            [r["joints_3d"][:, :2].astype(np.float32) for r in records]
        )
        center = np.stack([np.asarray(r["center"], np.float32) for r in records])
        scale = np.stack([np.asarray(r["scale"], np.float32) for r in records])
        bbox = np.stack([
            np.asarray(r.get("bbox", [0, 0, 0, 0]), np.float32)[:4]
            for r in records
        ])
        batch = {
            "img_raw": np.ascontiguousarray(images),
            # original-image coords (eval/decode space)
            "joints": joints,
            "center": center,
            "scale": scale,
            "bbox": bbox,
            # canvas coords (what the pixels in img_raw actually are)
            "joints_canvas": (joints - offset[:, None]) * fscale[:, None],
            "center_canvas": (center - offset) * fscale,
            "scale_canvas": scale * fscale,
            "bbox_canvas": np.concatenate(
                [(bbox[:, :2] - offset) * fscale, bbox[:, 2:] * fscale], axis=1
            ),
            "offset": offset,
            "img_scale": fscale,
            "vis": np.stack(
                [r["joints_3d_visible"][:, 0].astype(np.float32) for r in records]
            ),
            "rotation": np.zeros(len(records), np.float32),
            "image_file": [r["image_file"] for r in records],
            # fallback = the DATASET-GLOBAL record index: a batch-local
            # enumerate would collide across batches and the evaluator's
            # bbox_id dedup would collapse the epoch to one batch
            "bbox_id": np.asarray([
                r.get("bbox_id", int(gi)) for gi, r in zip(idxs, records)
            ]),
            "bbox_score": np.asarray(
                [r.get("bbox_score", 1.0) for r in records], np.float32
            ),
        }
        return batch

    def _raw_batches(self, epoch: int) -> Iterator[dict]:
        rng = np.random.RandomState(self.seed + epoch)
        idxs = self.local_indices.copy()
        if self.is_train:
            rng.shuffle(idxs)
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start:start + self.batch_size]
                if len(chunk) < self.batch_size:
                    if self.drop_last:
                        break
                    # pad to static batch size (repeat last records)
                    pad = self.batch_size - len(chunk)
                    chunk = np.concatenate([chunk, chunk[-1:].repeat(pad)])
                yield self._raw_batch(chunk, pool)

    def batches(self, epoch: int = 0, prefetch: int = 2) -> Iterator[dict]:
        key = jax.random.PRNGKey(self.seed * 100003 + epoch)
        raw_iter = self._raw_batches(epoch)
        if prefetch:
            # decode the next batch on a background thread while the device
            # works on the current one
            raw_iter = prefetch_iter(raw_iter, prefetch)
        for raw in raw_iter:
            if self.pipeline is None:
                yield raw
                continue
            key, sub = jax.random.split(key)
            pipe_in = (raw["img_raw"], raw["joints_canvas"], raw["vis"],
                       raw["center_canvas"], raw["scale_canvas"],
                       raw["rotation"])
            bboxes = raw["bbox_canvas"]
            if self.sharding is not None:
                pipe_in = tuple(
                    jax.device_put(a, self.sharding) for a in pipe_in)
                bboxes = jax.device_put(bboxes, self.sharding)
            out = self.pipeline(*pipe_in, sub, bboxes=bboxes)
            batch = dict(out)
            # center/scale back to ORIGINAL image coords so decode /
            # transform_preds land in annotation space (the crop content
            # is the same ROI either way)
            batch["center"] = out["center"] / raw["img_scale"] + raw["offset"]
            batch["scale"] = out["scale"] / raw["img_scale"]
            batch["img_raw"] = raw["img_raw"]
            batch["joints_src"] = raw["joints"]
            batch["vis_src"] = raw["vis"]
            if "bbox" in out:
                # the pipeline's bbox is in CROP space (region-map configs);
                # keep it addressable before "bbox" reverts to source coords
                batch["bbox_crop"] = out["bbox"]
            batch["bbox"] = raw["bbox"]
            # canvas geometry, for second-pass consumers (cycle detection)
            # that re-crop img_raw with fresh centers/scales
            batch["offset"] = raw["offset"]
            batch["img_scale"] = raw["img_scale"]
            batch["joints_canvas"] = raw["joints_canvas"]
            batch["bbox_canvas"] = raw["bbox_canvas"]
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
