"""Experiment: litehandnet on freihand (litehandnet/freihand_256_se)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=8, image_size=256,
        **{'MODEL.ca_type': 'se'},
    )
