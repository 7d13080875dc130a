"""Experiment mirroring reference config/mynet/_4_onehand10k_256x256_dark.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': False,
            'PIPELINE.rot_prob': 0.5,
            'PIPELINE.rot_factor': 45,
            'CHECKPOINT.load_best': True,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.type': 'AdamW',
            'OPTIMIZER.warmup_steps': 10,
            'LOSS.loss_weight': [1.0],
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'onehand10k', exp_id=4,
        image_size=[256, 256], **_OVERRIDES,
    )
