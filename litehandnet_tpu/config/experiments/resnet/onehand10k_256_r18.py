"""Experiment: resnet on onehand10k (resnet/onehand10k_256_r18)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'resnet', 'onehand10k', exp_id=23, image_size=256,
        **{'MODEL.depth': 18},
    )
