"""Experiment: srhandnet on panoptic (srhandnet/panoptic_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'srhandnet', 'panoptic', exp_id=54, image_size=256,
        **{},
    )
