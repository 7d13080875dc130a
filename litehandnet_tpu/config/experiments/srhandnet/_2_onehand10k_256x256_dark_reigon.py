"""Experiment mirroring reference config/srhandnet/_2_onehand10k_256x256_dark_reigon.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'CHECKPOINT.load_best': True,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.type': 'srhandnetloss',
            'LOSS.loss_weight': [0.3, 0.3, 0.5, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'srhandnet', 'onehand10k', exp_id=2,
        image_size=[256, 256], **_OVERRIDES,
    )
