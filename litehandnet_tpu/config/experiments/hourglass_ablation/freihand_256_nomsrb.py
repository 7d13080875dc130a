"""Experiment: hourglass_ablation on freihand (hourglass_ablation/freihand_256_nomsrb)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'hourglass_ablation', 'freihand', exp_id=49, image_size=256,
        **{'MODEL.msrb': False, 'MODEL.num_block': [2, 2, 2, 2]},
    )
