"""Experiment mirroring reference config/litehrnet/_2_freihand_224x244_dark_18.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.depth': 18,
            'MODEL.pred_bbox': True,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'EVAL.metric': ['PCK', 'AUC'],
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'litehrnet', 'freihand', exp_id=2,
        image_size=[224, 224], **_OVERRIDES,
    )
