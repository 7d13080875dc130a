"""Experiment: litehandnet on freihand (litehandnet/freihand_256_dark_h4_ca_r4)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=2, image_size=256,
        **{},
    )
