"""Experiment: litehrnet on coco_wholebody_hand (litehrnet/coco_wholebody_hand_256_d18)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehrnet', 'coco_wholebody_hand', exp_id=35, image_size=256,
        **{'MODEL.depth': 18},
    )
