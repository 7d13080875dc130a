"""Experiment mirroring reference config/hourglass/_3_freihand2d_224x224_dark_h1.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.num_stack': 1,
            'MODEL.num_level': 3,
            'MODEL.pred_bbox': False,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.sigma': [2],
            'CHECKPOINT.load_best': True,
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0],
        }


def _get_cfg():
    return make_cfg(
        'hourglass', 'freihand', exp_id=3,
        image_size=[224, 224], **_OVERRIDES,
    )
