"""Experiment: litehrnet on panoptic (litehrnet/panoptic_256_d30)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehrnet', 'panoptic', exp_id=39, image_size=256,
        **{'MODEL.depth': 30},
    )
