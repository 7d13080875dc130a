"""Experiment: litehandnet on rhd (litehandnet/rhd_256_dark_h4_ca_r4)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'rhd', exp_id=3, image_size=256,
        **{},
    )
