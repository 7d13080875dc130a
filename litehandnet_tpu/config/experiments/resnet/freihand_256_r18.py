"""Experiment: resnet on freihand (resnet/freihand_256_r18)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'resnet', 'freihand', exp_id=18, image_size=256,
        **{'MODEL.depth': 18},
    )
