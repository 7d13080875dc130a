"""Experiment: resnet on coco (resnet/coco_256_r50)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'resnet', 'coco', exp_id=24, image_size=[192, 256],
        **{'MODEL.depth': 50},
    )
