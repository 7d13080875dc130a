"""Experiment: mobilenetv2 on coco_wholebody_hand (mobilenetv2/coco_wholebody_hand_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mobilenetv2', 'coco_wholebody_hand', exp_id=30, image_size=256,
        **{},
    )
