"""Experiment: hourglass_ablation on freihand (hourglass_ablation/freihand_256_1x1)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'hourglass_ablation', 'freihand', exp_id=46, image_size=256,
        **{'MODEL.ca_type': '1x1'},
    )
