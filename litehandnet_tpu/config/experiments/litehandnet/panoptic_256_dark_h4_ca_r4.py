"""Experiment: litehandnet on panoptic (litehandnet/panoptic_256_dark_h4_ca_r4)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'panoptic', exp_id=5, image_size=256,
        **{},
    )
