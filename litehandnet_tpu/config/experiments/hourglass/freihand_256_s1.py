"""Experiment: hourglass on freihand (hourglass/freihand_256_s1)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'hourglass', 'freihand', exp_id=41, image_size=256,
        **{'MODEL.num_stack': 1},
    )
