"""Experiment: hourglass on mpii (hourglass/mpii_256_s2)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'hourglass', 'mpii', exp_id=43, image_size=256,
        **{},
    )
