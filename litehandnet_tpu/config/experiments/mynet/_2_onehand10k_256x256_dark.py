"""Experiment mirroring reference config/mynet/_2_onehand10k_256x256_dark.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.pred_bbox': True,
            'PIPELINE.rot_prob': 0.5,
            'PIPELINE.rot_factor': 45,
            'CHECKPOINT.load_best': True,
            'OPTIMIZER.type': 'AdamW',
            'OPTIMIZER.lr': 5e-05,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0],
            'LOSS.with_simdr': False,
        }


def _get_cfg():
    return make_cfg(
        'mynet', 'onehand10k', exp_id=2,
        image_size=[256, 256], **_OVERRIDES,
    )
