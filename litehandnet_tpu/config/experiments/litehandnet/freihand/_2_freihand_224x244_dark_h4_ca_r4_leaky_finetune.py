"""Experiment mirroring reference config/litehandnet/freihand/_2_freihand_224x244_dark_h4_ca_r4_leaky_finetune.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'TRAIN.total_epoches': 60,
            'TRAIN.batch_per_gpu': 24,
            'OPTIMIZER.step_epoch': [20, 40],
            'LOSS.loss_weight': [1.0, 0.5],
        }


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=2,
        image_size=[224, 224], **_OVERRIDES,
    )
