"""Experiment: srhandnet on onehand10k (srhandnet/onehand10k_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'srhandnet', 'onehand10k', exp_id=53, image_size=256,
        **{},
    )
