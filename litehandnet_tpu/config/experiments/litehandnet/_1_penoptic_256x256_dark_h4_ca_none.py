"""Experiment mirroring reference config/litehandnet/_1_penoptic_256x256_dark_h4_ca_none.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.num_stack': 1,
            'MODEL.msrb_ca': 'ca',
            'MODEL.use_se': False,
            'MODEL.p_dropout': 0.0,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'CHECKPOINT.load_best': True,
            'EVAL.save_best': 'PCKh',
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'litehandnet', 'panoptic', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
