"""Experiment mirroring reference config/litehandnet/freihand/_3_freihand_224x244_dark_h4_ca_r4_leaky_finetune_simdr.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.simdr_split_ratio': 2,
            'TRAIN.total_epoches': 100,
            'TRAIN.batch_per_gpu': 24,
            'OPTIMIZER.type': 'SGD',
            'OPTIMIZER.lr': 0.001,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0, 0.5],
        }


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=3,
        image_size=[224, 224], **_OVERRIDES,
    )
