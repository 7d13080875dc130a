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


class _AddictStub(dict):
    """Minimal stand-in for addict.Dict (not installed in this image):
    attribute access + recursive wrapping + empty-Dict on missing key."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for src in args + (kwargs,):
            if src:
                for k, v in dict(src).items():
                    self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, _AddictStub):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        if k in self:
            return self[k]
        return _AddictStub()

    def __setattr__(self, k, v):
        self[k] = v

    def __bool__(self):
        return len(self) > 0


def ensure_reference_importable():
    """Make `import models` / `from config import get_config` resolve to the
    reference checkout (with the missing `addict` dep stubbed)."""
    if "addict" not in sys.modules:
        m = types.ModuleType("addict")
        m.Dict = _AddictStub
        sys.modules["addict"] = m
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def load_ref_config(relpath: str):
    """Load a reference experiment config via the reference's own loader."""
    ensure_reference_importable()
    import importlib

    ref_config = importlib.import_module("config")
    return ref_config.get_config(relpath)


def build_ref_model(cfg):
    """Build the reference torch model for a reference cfg (eval mode)."""
    ensure_reference_importable()
    import importlib

    models = importlib.import_module("models")
    model = models.get_model(cfg)
    model.eval()
    return model


def load_myeval_hand():
    """reference utils/post_processing/evaluation/myeval_hand.py — the
    vendored COCOeval. Its pycocotools.mask import is unused for the
    keypoints iouType; stubbed since pycocotools is not installed."""
    if "pycocotools" not in sys.modules:
        pkg = types.ModuleType("pycocotools")
        mask = types.ModuleType("pycocotools.mask")
        pkg.mask = mask
        sys.modules["pycocotools"] = pkg
        sys.modules["pycocotools.mask"] = mask
    import numpy as np

    # the vendored evaluator predates numpy 2.0's alias removal
    for alias, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    return _load(
        "utils/post_processing/evaluation/myeval_hand.py", "_ref_myeval_hand"
    )


WHOLEBODY_DIR = "utils/post_processing/coco_wholebody_evaluation"


def load_wholebody_evaluator(part: str):
    """reference coco_wholebody_evaluation/myeval_<part>.py (stubs as in
    load_myeval_hand)."""
    load_myeval_hand()  # installs the pycocotools / numpy-alias stubs
    return _load(f"{WHOLEBODY_DIR}/myeval_{part}.py", f"_ref_myeval_{part}")
