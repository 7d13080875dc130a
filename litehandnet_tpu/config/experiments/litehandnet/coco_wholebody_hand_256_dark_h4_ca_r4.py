"""Experiment: litehandnet on coco_wholebody_hand (litehandnet/coco_wholebody_hand_256_dark_h4_ca_r4)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'coco_wholebody_hand', exp_id=6, image_size=256,
        **{},
    )
