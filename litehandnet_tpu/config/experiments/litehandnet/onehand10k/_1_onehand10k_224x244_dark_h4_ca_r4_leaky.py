"""Experiment mirroring reference config/litehandnet/onehand10k/_1_onehand10k_224x244_dark_h4_ca_r4_leaky.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.input_channel': 256,
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
            'TRAIN.total_epoches': 100,
            'TRAIN.batch_per_gpu': 8,
            'OPTIMIZER.warmup_steps': 100,
            'OPTIMIZER.step_epoch': [60, 80],
            'OPTIMIZER.reuseme': False,
            'LOSS.loss_weight': [1.0, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'litehandnet', 'onehand10k', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
