"""Experiment: mynet_stacked on freihand (mynet_stacked/freihand_256_region_simdr)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mynet_stacked', 'freihand', exp_id=16, image_size=256,
        **{},
    )
