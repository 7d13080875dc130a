"""Experiment: srhandnet on rhd (srhandnet/rhd_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'srhandnet', 'rhd', exp_id=52, image_size=256,
        **{},
    )
