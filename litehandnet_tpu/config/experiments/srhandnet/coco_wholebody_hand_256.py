"""Experiment: srhandnet on coco_wholebody_hand (srhandnet/coco_wholebody_hand_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'srhandnet', 'coco_wholebody_hand', exp_id=55, image_size=256,
        **{},
    )
