"""Experiment: srhandnet on freihand (srhandnet/freihand_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'srhandnet', 'freihand', exp_id=51, image_size=256,
        **{},
    )
