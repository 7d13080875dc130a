"""Experiment: mynet on rhd (mynet/rhd_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mynet', 'rhd', exp_id=12, image_size=256,
        **{},
    )
