"""Process-sharded batch decode: N OS processes feeding one shared-memory
canvas block.

The reference parallelizes image IO with torch DataLoader worker PROCESSES
(datasets/dataloader.py:7-55). The in-process paths here (cv2 thread pool,
native C++ pthread pool in `litehandnet_tpu/native`) already parallelize on
a real multi-core host, but everything upstream of them — JPEG header
parsing, numpy canvas assembly, the Python record plumbing — still holds
the GIL. This module removes the host-Python ceiling entirely: a persistent
pool of worker processes, each decoding its contiguous slice of the batch
straight into one `multiprocessing.shared_memory` canvas block, so the only
per-batch IPC is a few small float arrays (offsets/scales/statuses) — the
canvases are written in place and never pickled.

Per worker, decode uses the native libjpeg-turbo ROI decoder single-threaded
(processes supply the parallelism) and falls back to the cv2/PIL path with
identical geometry per image, exactly like `DataLoader._decode_batch`.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from multiprocessing import shared_memory
from typing import Sequence

import numpy as np

_worker: dict = {}


def _init_worker(shm_name: str, shape, use_native: bool):
    """Runs once per worker process: attach the shared canvas block."""
    shm = shared_memory.SharedMemory(name=shm_name)
    _worker["shm"] = shm  # keep a ref or the mapping is GC'd
    _worker["canvases"] = np.ndarray(shape, np.uint8, buffer=shm.buf)
    # decided once per process — honoring the caller's use_native=False
    # (workers must not re-enable a decoder the user disabled); import here
    # so a worker missing the toolchain degrades alone
    from litehandnet_tpu import native

    _worker["native"] = bool(use_native) and native.available()


def _decode_slice(args):
    """Decode paths[i0:i0+n] into the shared canvas slots [i0, i0+n)."""
    (i0, paths, centers, scales, margin, canvas_hw) = args
    from litehandnet_tpu import native
    from litehandnet_tpu.data.loader import _load_image

    n = len(paths)
    view = _worker["canvases"][i0:i0 + n]
    offsets = np.zeros((n, 2), np.float32)
    fscales = np.ones((n, 2), np.float32)
    statuses = np.ones(n, np.int32)
    if _worker["native"]:
        wxy = scales * 200.0 * margin
        halves = (np.hypot(wxy[:, 0], wxy[:, 1]) / 2.0 + 4.0).astype(
            np.float32
        )
        canv, off, fsc, statuses = native.decode_roi_batch(
            paths, canvas_hw, centers, halves, n_threads=1
        )
        view[:] = canv
        offsets[:], fscales[:] = off, fsc
    for i in np.nonzero(statuses)[0]:
        img, off, fsc = _load_image(
            paths[i], canvas_hw, center=centers[i], scale=scales[i],
            margin=margin,
        )
        view[i] = img
        offsets[i], fscales[i] = off, fsc
    return i0, offsets, fscales


class ProcessDecodePool:
    """Persistent decode-worker pool over one shared-memory canvas block.

    decode() fills the block for a batch and returns views into it — the
    caller must consume (or copy) a batch before requesting the next one
    (double-buffering belongs one level up, in `prefetch_iter`, where the
    device pipeline has already copied the canvases to the device).
    """

    def __init__(self, n_procs: int, batch_size: int, canvas_hw,
                 roi_margin: float = 1.1, use_native: bool = True):
        self.n_procs = int(n_procs)
        self.batch = int(batch_size)
        self.canvas_hw = (int(canvas_hw[0]), int(canvas_hw[1]))
        self.margin = float(roi_margin)
        shape = (self.batch, *self.canvas_hw, 3)
        self._shm = shared_memory.SharedMemory(
            create=True, size=int(np.prod(shape))
        )
        self.canvases = np.ndarray(shape, np.uint8, buffer=self._shm.buf)
        # spawn (not fork): the parent holds a live JAX runtime whose fds /
        # locks must not leak into decode workers
        ctx = mp.get_context("spawn")
        self._pool = ctx.Pool(
            self.n_procs, initializer=_init_worker,
            initargs=(self._shm.name, shape, bool(use_native)),
        )

    def decode(self, paths: Sequence[str], centers: np.ndarray,
               scales: np.ndarray):
        """Returns (canvases view [N,H,W,3] u8, offsets [N,2], scales [N,2])
        with `_load_image` geometry: src -> canvas is (p - offset) * scale."""
        n = len(paths)
        assert n <= self.batch, (n, self.batch)
        centers = np.ascontiguousarray(centers, np.float32)
        scales = np.ascontiguousarray(scales, np.float32)
        per = -(-n // self.n_procs)
        tasks = [
            (i0, list(paths[i0:i0 + per]), centers[i0:i0 + per],
             scales[i0:i0 + per], self.margin, self.canvas_hw)
            for i0 in range(0, n, per)
        ]
        offsets = np.zeros((n, 2), np.float32)
        fscales = np.ones((n, 2), np.float32)
        for i0, off, fsc in self._pool.imap_unordered(_decode_slice, tasks):
            k = len(off)
            offsets[i0:i0 + k] = off
            fscales[i0:i0 + k] = fsc
        return self.canvases[:n], offsets, fscales

    def close(self):
        self._pool.terminate()
        self._pool.join()
        self._shm.close()
        try:
            self._shm.unlink()
        except FileNotFoundError:  # pragma: no cover
            pass

    def __del__(self):  # best effort; explicit close() preferred
        try:
            self.close()
        except Exception:
            pass


def default_procs() -> int:
    """Worker count for a real TPU-VM host: leave 2 cores for the JAX
    dispatch thread + device pipeline, floor 1 (this dev rig has 1)."""
    return max((os.cpu_count() or 1) - 2, 1)
