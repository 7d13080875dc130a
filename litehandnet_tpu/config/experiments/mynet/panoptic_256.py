"""Experiment: mynet on panoptic (mynet/panoptic_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mynet', 'panoptic', exp_id=14, image_size=256,
        **{},
    )
