"""Experiment: litehandnet on onehand10k (litehandnet/onehand10k_256_dark_h4_ca_r4)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'onehand10k', exp_id=4, image_size=256,
        **{},
    )
