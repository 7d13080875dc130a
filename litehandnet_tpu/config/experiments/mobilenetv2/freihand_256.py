"""Experiment: mobilenetv2 on freihand (mobilenetv2/freihand_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mobilenetv2', 'freihand', exp_id=26, image_size=256,
        **{},
    )
