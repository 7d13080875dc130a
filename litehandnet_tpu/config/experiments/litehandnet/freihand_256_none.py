"""Experiment: litehandnet on freihand (litehandnet/freihand_256_none)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=9, image_size=256,
        **{'MODEL.ca_type': 'none'},
    )
