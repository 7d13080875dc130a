"""Experiment: resnet on mpii (resnet/mpii_256_r50)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'resnet', 'mpii', exp_id=25, image_size=256,
        **{'MODEL.depth': 50},
    )
