"""Experiment: hourglass_ablation on freihand (hourglass_ablation/freihand_256_rca)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'hourglass_ablation', 'freihand', exp_id=50, image_size=256,
        **{'MODEL.rca': True},
    )
