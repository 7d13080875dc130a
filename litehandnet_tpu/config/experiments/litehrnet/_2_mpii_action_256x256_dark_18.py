"""Experiment mirroring reference config/litehrnet/_2_mpii_action_256x256_dark_18.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.depth': 18,
            'MODEL.pred_bbox': True,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'CHECKPOINT.resume': False,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCKh', 'AUC', 'EPE'],
            'EVAL.save_best': 'PCKh',
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 8,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0],
            'LOSS.with_simdr': False,
        }


def _get_cfg():
    return make_cfg(
        'litehrnet', 'mpii_action', exp_id=2,
        image_size=[256, 256], **_OVERRIDES,
    )
