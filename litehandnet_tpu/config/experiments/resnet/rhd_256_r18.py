"""Experiment: resnet on rhd (resnet/rhd_256_r18)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'resnet', 'rhd', exp_id=27, image_size=256,
        **{'MODEL.depth': 18},
    )
