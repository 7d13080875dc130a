"""Experiment mirroring reference config/mynet/_1_coco_wholebody_hand_256x256.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': True,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'CHECKPOINT.load_best': True,
            'TRAIN.syncBN': False,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'coco_wholebody_hand', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
