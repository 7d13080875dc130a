"""Native (C++) host-runtime components, bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; the host IO runtime around it is
native where it is hot. `jpeg_roi.cpp` replaces the per-image Python decode
of the reference's DataLoader workers (datasets/data_pipeline/loading.py:6-89)
with a batched libjpeg-turbo ROI decoder: partial scanline decode around the
bbox, DCT-domain downscaling, and a pthread pool that costs one GIL release
per batch.

The library is compiled on first use with g++ (no pybind11 in this image;
plain C ABI + ctypes keeps the binding dependency-free) and cached next to
the source. Every entry point degrades gracefully: if the toolchain or
libjpeg is missing, callers fall back to the cv2/PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "jpeg_roi.cpp")
_LIB_PATH = os.path.join(_HERE, "_jpeg_roi.so")
_ABI_VERSION = 1

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    # built per-host (gitignored), so -march=native is safe and lets gcc
    # autovectorize the bilinear resize
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-ljpeg", "-lpthread",
    ]
    try:
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        return False
    return True


def _load():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("LHN_DISABLE_NATIVE"):
            _lib_failed = True
            return None
        needs_build = not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        )
        if needs_build and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            if lib.lhn_abi_version() != _ABI_VERSION:
                raise OSError("ABI mismatch")
        except OSError:
            # stale binary: rebuild once
            if not _build():
                _lib_failed = True
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                _lib_failed = True
                return None
        lib.lhn_decode_roi_batch.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.lhn_decode_roi_batch.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native decoder can be used on this host."""
    return _load() is not None


def decode_roi_batch(paths, canvas_hw, centers, halves, n_threads=8):
    """Batch-decode JPEGs into zero-padded canvases with ROI semantics.

    Mirrors data/loader.py::_load_image geometry exactly: source coords map
    to canvas coords as ``(p - offset) * scale``.

    Args:
        paths: list of N file paths.
        canvas_hw: (H0, W0) static canvas.
        centers: [N, 2] float ROI centers in source coords.
        halves: [N] float half-window size; negative = whole image.
        n_threads: decode workers (saturates real TPU-host core counts).

    Returns:
        (canvases [N,H0,W0,3] u8, offsets [N,2] f32, scales [N,2] f32,
         statuses [N] i32) — status != 0 means that image needs the Python
         fallback (non-JPEG, progressive, CMYK, IO error).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    H0, W0 = int(canvas_hw[0]), int(canvas_hw[1])
    canvases = np.zeros((n, H0, W0, 3), np.uint8)
    centers = np.ascontiguousarray(centers, np.float32).reshape(n, 2)
    halves = np.ascontiguousarray(halves, np.float32).reshape(n)
    geoms = np.zeros((n, 4), np.float32)
    statuses = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths]
    )
    lib.lhn_decode_roi_batch(
        n,
        c_paths,
        canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H0,
        W0,
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        halves.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        geoms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(n_threads),
    )
    return canvases, geoms[:, :2].copy(), geoms[:, 2:].copy(), statuses
