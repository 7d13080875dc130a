"""Experiment: mobilenetv2 on onehand10k (mobilenetv2/onehand10k_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mobilenetv2', 'onehand10k', exp_id=28, image_size=256,
        **{},
    )
