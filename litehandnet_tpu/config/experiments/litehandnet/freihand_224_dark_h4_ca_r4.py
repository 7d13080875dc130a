"""Experiment: litehandnet on freihand (litehandnet/freihand_224_dark_h4_ca_r4)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=7, image_size=224,
        **{},
    )
