"""Experiment mirroring reference config/litehandnet/rhd/_1_rhd_224x244_dark_h4_ca.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.input_channel': 256,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'TRAIN.total_epoches': 100,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 100,
            'OPTIMIZER.step_epoch': [60, 80],
            'OPTIMIZER.reuseme': False,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'litehandnet', 'rhd', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
