"""Experiment mirroring reference config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.num_stack': 2,
            'MODEL.msrb_ca': 'ca',
            'MODEL.rbu_ca': 'none',
            'MODEL.input_channel': 256,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.sigma': [2, 2],
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=2,
        image_size=[224, 224], **_OVERRIDES,
    )
