"""Experiment: atthandnet on freihand (atthandnet/freihand_224)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'atthandnet', 'freihand', exp_id=56, image_size=224,
        **{'LOSS.loss_weight': [1.0]},
    )
