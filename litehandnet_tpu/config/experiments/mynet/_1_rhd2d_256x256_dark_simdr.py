"""Experiment mirroring reference config/mynet/_1_rhd2d_256x256_dark_simdr.py (same knobs; dataset
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
            'TRAIN.total_epoches': 100,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'OPTIMIZER.step_epoch': [60, 80],
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'rhd', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
