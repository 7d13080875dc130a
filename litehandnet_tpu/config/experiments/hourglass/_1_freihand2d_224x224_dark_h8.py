"""Experiment mirroring reference config/hourglass/_1_freihand2d_224x224_dark_h8.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.num_stack': 8,
            'MODEL.num_level': 3,
            'MODEL.pred_bbox': True,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.sigma': [2, 2, 2, 2, 2, 2, 2, 2],
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 8,
            'OPTIMIZER.warmup_steps': 100,
            'OPTIMIZER.step_epoch': [90, 110],
            'LOSS.loss_weight': [1.0],
        }


def _get_cfg():
    return make_cfg(
        'hourglass', 'freihand', exp_id=1,
        image_size=[224, 224], **_OVERRIDES,
    )
