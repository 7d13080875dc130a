"""Experiment mirroring reference config/srhandnet/_1_freihand2d_224x224_region.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'PIPELINE.unbiased_encoding': False,
            'CHECKPOINT.resume': False,
            'TRAIN.syncBN': False,
            'OPTIMIZER.lr': 0.0001,
            'OPTIMIZER.warmup_steps': 200,
            'LOSS.type': 'srhandnetloss',
            'LOSS.loss_weight': [0.3, 0.3, 0.5, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'srhandnet', 'freihand', exp_id=1,
        image_size=[224, 224], **_OVERRIDES,
    )
