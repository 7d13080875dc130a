"""Config system.

Mirrors the reference's config surface (reference: config/__init__.py:4-39):
`get_config(path_or_name)` loads an experiment-config python module exposing
`_get_cfg() -> dict` and wraps it in an attribute-access dict; `pcfg` carries
the global post-processing hyper-parameters used by the decoders.

Experiment configs keep the reference schema
`{ID, MODEL, DATASET, PIPELINE, CHECKPOINT, EVAL, TRAIN, OPTIMIZER, LOSS}`
so reference configs translate 1:1 (reference: config/litehandnet/freihand/
_1_freihand_224x244_dark_h4_ca_r4_leaky.py:1-82).
"""

from __future__ import annotations

import importlib
import importlib.util
import os
from typing import Any

__all__ = ["Config", "get_config", "pcfg", "config_from_dict"]


class Config(dict):
    """Attribute-access dict (stand-in for `addict.Dict`).

    `cfg.MODEL.name` works; `.get(key, default)` works; missing attribute
    access raises AttributeError rather than silently creating entries
    (stricter than addict — catches config typos at call sites).
    """

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, Config):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._wrap(v) for v in value)
        return value

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = self._wrap(value)

    def __setitem__(self, name: str, value: Any) -> None:
        super().__setitem__(name, self._wrap(value))

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(
                    x.to_dict() if isinstance(x, Config) else x for x in v
                )
            else:
                out[k] = v
        return out


#: Global post-processing hyper-parameters (reference: config/__init__.py:4-24).
#: Values mirror the reference's shipped pcfg exactly (key renames:
#: blue_kernel -> dark_kernel, cd_iou -> cycle_detection_diou,
#: cd_ratio -> cycle_detection_area_ratio). Parsers take these as
#: constructor overrides, replacing the reference pattern of editing the
#: global dict per experiment.
pcfg = Config(
    # center-map / bbox decoding
    nms_kernel=11,           # max-pool NMS kernel for center maps
    num_candidates=10,       # top-k center peaks considered before NMS
    max_num_bbox=1,          # boxes kept per image after NMS
    detection_threshold=0.1, # min center score to count as a detection
    iou_threshold=0.6,       # IoU-NMS threshold for candidate bboxes
    bbox_factor=1.3,         # bbox padding factor for keypoint windows
    # DARK sub-pixel refinement
    dark_kernel=19,          # Gaussian-blur kernel ('blue_kernel' upstream)
    # cycle detection (re-infer small/overlapping hands)
    cycle_detection_diou=0.3,
    cycle_detection_area_ratio=0.0,
    # SimDR decoding
    simdr_nms_kernel=5,
    # bottom-up tag grouping (Gen-1 HeatmapParser)
    tag_threshold=1.0,       # read but never used upstream (vestigial)
    use_detection_val=True,  # read but never used upstream (vestigial)
    ignore_too_much=True,    # read but never used upstream (vestigial)
    bbox_k=3,                # per-joint top-k candidates inside a bbox
    region_avg_kernel=3,
    region_avg_stride=1,
    # absent from the reference pcfg although HeatmapParser.py:31 reads it
    # (KeyError as shipped); 1 = size-preserving for the 3x1 avg pool
    region_avg_padding=1,
)


def config_from_dict(d: dict) -> Config:
    """Wrap a plain config dict, applying cross-field consistency rules."""
    cfg = Config(d)
    # Consistency rule from the reference loader (config/__init__.py:33-36):
    # a model that predicts bboxes (region maps) cannot train with rotation.
    # Only rot_prob is zeroed (exactly as upstream); rot_factor is inert
    # once the probability is 0.
    model = cfg.get("MODEL", {})
    pipeline = cfg.get("PIPELINE", {})
    if model.get("pred_bbox", False) and "PIPELINE" in cfg:
        pipeline["rot_prob"] = 0
    return cfg


def get_config(cfg_path: str) -> Config:
    """Load an experiment config.

    Accepts either
      * a filesystem path to a `.py` file exposing `_get_cfg()`, or
      * a dotted / slash-separated name under
        `litehandnet_tpu/config/experiments/` (e.g.
        ``litehandnet/freihand_224x224_dark`` or the same with dots).
    """
    if os.path.isfile(cfg_path):
        stem = os.path.splitext(os.path.basename(cfg_path))[0]
        spec = importlib.util.spec_from_file_location("_exp_cfg", cfg_path)
        assert spec is not None and spec.loader is not None, cfg_path
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
    else:
        name = cfg_path.replace("/", ".").replace("\\", ".")
        if name.endswith(".py"):
            name = name[: -len(".py")]
        # the module file's stem is the last dotted segment (for
        # `mynet._1_freihand2d_224x224` that is `_1_freihand2d_224x224`)
        stem = name.rsplit(".", 1)[-1]
        module = importlib.import_module(
            f"litehandnet_tpu.config.experiments.{name}"
        )
    if not hasattr(module, "_get_cfg"):
        raise ValueError(f"config {cfg_path!r} does not define _get_cfg()")
    cfg = config_from_dict(module._get_cfg())
    # reference cross-check (utils/misc.py:14-15): a `_<id>_...` file name
    # must agree with the config's ID — catches copy-paste experiment mixups
    stem_parts = stem.split("_")
    if (len(stem_parts) > 1 and stem_parts[0] == ""
            and stem_parts[1].isdigit()):
        file_id = int(stem_parts[1])
        if cfg.get("ID") != file_id:
            raise ValueError(
                f"config file id {file_id} != cfg ID {cfg.get('ID')} "
                f"({cfg_path}; reference utils/misc.py:14-15)"
            )
    return cfg
