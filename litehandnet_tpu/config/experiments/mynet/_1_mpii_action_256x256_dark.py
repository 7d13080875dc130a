"""Experiment mirroring reference config/mynet/_1_mpii_action_256x256_dark.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': True,
            'MODEL.output_swish': False,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'CHECKPOINT.resume': False,
            'CHECKPOINT.load_best': True,
            'EVAL.metric': ['PCKh', 'AUC', 'EPE'],
            'EVAL.save_best': 'PCKh',
            'TRAIN.syncBN': False,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0],
            'LOSS.with_simdr': False,
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'mpii_action', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
