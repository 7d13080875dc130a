"""Experiment: mynet on onehand10k (mynet/onehand10k_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mynet', 'onehand10k', exp_id=13, image_size=256,
        **{},
    )
