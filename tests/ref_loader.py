"""Load pure-numpy modules from the read-only reference checkout for parity
tests. The reference at /root/reference is PyTorch/numpy; only its
numpy+cv2-only modules are loaded (never copied into this repo), and tests
skip cleanly when the checkout is absent.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REF_ROOT)


def _load(relpath: str, modname: str):
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF_ROOT, relpath)
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules[modname] = module
    spec.loader.exec_module(module)
    return module


def load_post_transforms():
    """reference datasets/data_pipeline/post_transforms.py (numpy+cv2 only)."""
    return _load(
        "datasets/data_pipeline/post_transforms.py",
        "datasets.data_pipeline.post_transforms",
    )


def load_generate_target():
    """reference datasets/data_pipeline/generateTarget.py (numpy+cv2 only)."""
    return _load(
        "datasets/data_pipeline/generateTarget.py",
        "_ref_generate_target",
    )


def load_generate_simdr():
    return _load("datasets/data_pipeline/generate_simder.py", "_ref_generate_simdr")


def load_topdown_affine():
    """reference datasets/data_pipeline/topdown_affine.py (TopDownAffine /
    TopDownGetRandomScaleRotation; numpy+cv2+torch-import-only)."""
    for name in ("datasets", "datasets.data_pipeline"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    load_post_transforms()
    return _load(
        "datasets/data_pipeline/topdown_affine.py",
        "datasets.data_pipeline.topdown_affine",
    )


def load_top_down_eval():
    """reference top_down_eval.py; needs the post_transforms module registered
    under its package name first."""
    for name in ("datasets", "datasets.data_pipeline"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    load_post_transforms()
    return _load(
        "utils/post_processing/evaluation/top_down_eval.py",
        "_ref_top_down_eval",
    )
