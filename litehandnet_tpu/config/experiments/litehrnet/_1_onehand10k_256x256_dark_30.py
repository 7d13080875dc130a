"""Experiment mirroring reference config/litehrnet/_1_onehand10k_256x256_dark_30.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': False,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'TRAIN.batch_per_gpu': 8,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0],
        }


def _get_cfg():
    return make_cfg(
        'litehrnet', 'onehand10k', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
