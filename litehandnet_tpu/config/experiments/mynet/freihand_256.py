"""Experiment: mynet on freihand (mynet/freihand_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mynet', 'freihand', exp_id=11, image_size=256,
        **{},
    )
