"""Experiment mirroring reference config/mynet/_1_freihand2d_224x224.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': True,
            'MODEL.output_swish': False,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.unbiased_encoding': False,
            'CHECKPOINT.resume': False,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCK', 'AUC'],
            'TRAIN.syncBN': False,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0],
            'LOSS.with_simdr': False,
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'freihand', exp_id=1,
        image_size=[224, 224], **_OVERRIDES,
    )
