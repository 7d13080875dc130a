"""Experiment: litehrnet on panoptic (litehrnet/panoptic_256_d18)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehrnet', 'panoptic', exp_id=34, image_size=256,
        **{'MODEL.depth': 18},
    )
