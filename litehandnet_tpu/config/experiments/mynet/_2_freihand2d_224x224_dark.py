"""Experiment mirroring reference config/mynet/_2_freihand2d_224x224_dark.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': True,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCK', 'AUC'],
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 64,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0],
            'LOSS.with_simdr': False,
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'freihand', exp_id=2,
        image_size=[224, 224], **_OVERRIDES,
    )
