"""Experiment: mynet_stacked on mpii (mynet_stacked/mpii_256_region_simdr)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mynet_stacked', 'mpii', exp_id=17, image_size=256,
        **{},
    )
