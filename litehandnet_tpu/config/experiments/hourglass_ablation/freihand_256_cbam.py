"""Experiment: hourglass_ablation on freihand (hourglass_ablation/freihand_256_cbam)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'hourglass_ablation', 'freihand', exp_id=48, image_size=256,
        **{'MODEL.ca_type': 'cbam'},
    )
