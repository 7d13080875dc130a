"""Model zoo registry.

`get_model(cfg, ...)` maps `cfg.MODEL.name` to a Flax module, mirroring the
reference registry surface (models/__init__.py:20-26) without `eval`.
All models are NHWC: input [B, H, W, 3], heatmap outputs [B, H/4, W/4, K]
(SRHandNet returns a 4-tuple of scales; AttHandNet returns coordinates).
"""

from __future__ import annotations

from litehandnet_tpu.models.litehandnet import LiteHandNet  # noqa: F401
from litehandnet_tpu.models.reparam import fuse_params  # noqa: F401

_REGISTRY = {}


def register(name: str):
    def deco(ctor):
        _REGISTRY[name] = ctor
        return ctor
    return deco


def model_names():
    return sorted(_REGISTRY)


def get_model(cfg, deploy: bool = False, axis_name=None, dtype=None):
    """Build the model named by ``cfg.MODEL.name``.

    Args:
        cfg: experiment config.
        deploy: build the re-parameterized inference graph (weights come from
            `fuse_params` over train-mode variables).
        axis_name: mesh axis name for cross-device BatchNorm (SyncBN).
        dtype: compute dtype (e.g. jnp.bfloat16); params stay float32.
    """
    name = cfg.MODEL.name.lower()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {model_names()}"
        )
    return _REGISTRY[name](cfg, deploy=deploy, axis_name=axis_name, dtype=dtype)


@register("litehandnet")
def _litehandnet(cfg, **kw):
    return LiteHandNet.from_config(cfg, **kw)


def _register_lazy(name: str, module_path: str, attr: str):
    """Register a model family imported on first use (keeps import light)."""

    def ctor(cfg, **kw):
        import importlib

        mod = importlib.import_module(module_path)
        return getattr(mod, attr).from_config(cfg, **kw)

    _REGISTRY[name] = ctor


_register_lazy("mynet", "litehandnet_tpu.models.ms_att_hourglass", "MSAttHourglass")
_register_lazy(
    "hourglass", "litehandnet_tpu.models.hourglass", "HourglassNet"
)
_register_lazy(
    "hourglass_ablation",
    "litehandnet_tpu.models.hourglass_ablation",
    "HourglassAblation",
)
_register_lazy("litehrnet", "litehandnet_tpu.models.litehrnet", "LiteHRNet")
_register_lazy("resnet", "litehandnet_tpu.models.simplebaseline", "PoseResNet")
_register_lazy(
    "mobilenetv2", "litehandnet_tpu.models.simplebaseline", "PoseMobileNetV2"
)
_register_lazy("srhandnet", "litehandnet_tpu.models.srhandnet", "SRHandNet")
_register_lazy("atthandnet", "litehandnet_tpu.models.atthandnet", "AttHandNet")
_register_lazy("classifier", "litehandnet_tpu.models.classifier", "ImageClassifier")
_register_lazy("yolov6", "litehandnet_tpu.models.yolov6", "YOLOv6")
_register_lazy(
    "litehandnet_msrb",
    "litehandnet_tpu.models.litehandnet_msrb",
    "LiteHandNetMSRB",
)
_register_lazy(
    "mynet_stacked",
    "litehandnet_tpu.models.ms_att_hourglass_stacked",
    "MSAttHourglassStacked",
)
