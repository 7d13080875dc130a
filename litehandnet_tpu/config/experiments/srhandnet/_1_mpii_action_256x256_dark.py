"""Experiment mirroring reference config/srhandnet/_1_mpii_action_256x256_dark.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.output_channel': 16,
            'CHECKPOINT.resume': False,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCKh', 'AUC', 'EPE'],
            'EVAL.save_best': 'PCKh',
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 4,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.type': 'srhandnetloss',
            'LOSS.loss_weight': [0.3, 0.3, 0.5, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'srhandnet', 'mpii_action', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
