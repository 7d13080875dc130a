"""Experiment mirroring reference config/litehandnet/_3_rhd2d_256x256_dark_h4_ca_none_w256.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.num_stack': 2,
            'MODEL.msrb_ca': 'ca',
            'MODEL.rbu_ca': 'none',
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'PIPELINE.sigma': [2, 2],
            'CHECKPOINT.load_best': True,
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
        }


def _get_cfg():
    return make_cfg(
        'litehandnet', 'rhd', exp_id=3,
        image_size=[256, 256], **_OVERRIDES,
    )
