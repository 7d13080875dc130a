"""Experiment mirroring reference config/mynet/_9_freihand2d_224x224_dark_resnet50.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.num_stage': 5,
            'MODEL.num_block': [2, 3, 5, 2],
            'MODEL.pred_bbox': False,
            'MODEL.output_activation': False,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCK', 'AUC'],
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'freihand', exp_id=9,
        image_size=[224, 224], **_OVERRIDES,
    )
