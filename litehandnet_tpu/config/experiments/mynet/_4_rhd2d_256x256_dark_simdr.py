"""Experiment mirroring reference config/mynet/_4_rhd2d_256x256_dark_simdr.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': True,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.simdr_split_ratio': 2,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCK', 'AUC'],
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'rhd', exp_id=4,
        image_size=[256, 256], **_OVERRIDES,
    )
