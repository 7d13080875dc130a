"""Experiment mirroring reference config/litehrnet/_2_penoptic_256x256_dark_18.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.depth': 18,
            'MODEL.pred_bbox': False,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'CHECKPOINT.load_best': True,
            'EVAL.save_best': 'PCKh',
            'TRAIN.batch_per_gpu': 8,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'litehrnet', 'panoptic', exp_id=2,
        image_size=[256, 256], **_OVERRIDES,
    )
