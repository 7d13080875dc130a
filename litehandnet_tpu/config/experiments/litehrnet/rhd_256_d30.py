"""Experiment: litehrnet on rhd (litehrnet/rhd_256_d30)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehrnet', 'rhd', exp_id=37, image_size=256,
        **{'MODEL.depth': 30},
    )
