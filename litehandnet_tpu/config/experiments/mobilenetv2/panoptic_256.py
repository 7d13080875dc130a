"""Experiment: mobilenetv2 on panoptic (mobilenetv2/panoptic_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mobilenetv2', 'panoptic', exp_id=29, image_size=256,
        **{},
    )
