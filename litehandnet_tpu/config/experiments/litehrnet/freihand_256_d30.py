"""Experiment: litehrnet on freihand (litehrnet/freihand_256_d30)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehrnet', 'freihand', exp_id=36, image_size=256,
        **{'MODEL.depth': 30},
    )
