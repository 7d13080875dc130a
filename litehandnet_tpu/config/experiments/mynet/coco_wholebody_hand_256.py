"""Experiment: mynet on coco_wholebody_hand (mynet/coco_wholebody_hand_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mynet', 'coco_wholebody_hand', exp_id=15, image_size=256,
        **{},
    )
