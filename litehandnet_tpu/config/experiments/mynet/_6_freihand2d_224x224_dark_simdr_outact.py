"""Experiment mirroring reference config/mynet/_6_freihand2d_224x224_dark_simdr_outact.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': False,
            'MODEL.output_activation': True,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.simdr_split_ratio': 2,
            'CHECKPOINT.resume': False,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCK', 'AUC'],
            'TRAIN.syncBN': False,
            'TRAIN.total_epoches': 100,
            'OPTIMIZER.warmup_steps': 100,
            'OPTIMIZER.step_epoch': [60, 80],
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'freihand', exp_id=6,
        image_size=[224, 224], **_OVERRIDES,
    )
