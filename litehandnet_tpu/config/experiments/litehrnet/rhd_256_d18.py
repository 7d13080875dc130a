"""Experiment: litehrnet on rhd (litehrnet/rhd_256_d18)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehrnet', 'rhd', exp_id=32, image_size=256,
        **{'MODEL.depth': 18},
    )
