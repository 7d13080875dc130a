"""Experiment mirroring reference config/atthandnet/_1_freihand2d_224x224.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': True,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.unbiased_encoding': False,
            'CHECKPOINT.resume': False,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCK', 'AUC'],
            'TRAIN.batch_per_gpu': 4,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0],
        }


def _get_cfg():
    return make_cfg(
        'atthandnet', 'freihand', exp_id=1,
        image_size=[224, 224], **_OVERRIDES,
    )
