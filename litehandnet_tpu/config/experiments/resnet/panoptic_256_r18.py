"""Experiment: resnet on panoptic (resnet/panoptic_256_r18)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'resnet', 'panoptic', exp_id=26, image_size=256,
        **{'MODEL.depth': 18},
    )
