"""Experiment: litehrnet on onehand10k (litehrnet/onehand10k_256_d18)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehrnet', 'onehand10k', exp_id=33, image_size=256,
        **{'MODEL.depth': 18},
    )
