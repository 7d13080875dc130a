"""Experiment mirroring reference config/srhandnet/_4_onehand10k_256x256_dark.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.output_channel': 21,
            'MODEL.pred_bbox': False,
            'PIPELINE.rot_prob': 0.5,
            'PIPELINE.rot_factor': 45,
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.type': 'RMSprop',
            'OPTIMIZER.lr': 0.001,
            'OPTIMIZER.warmup_steps': 100,
            'LOSS.type': 'srhandnetloss',
            'LOSS.loss_weight': [0.2, 0.2, 0.3, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'srhandnet', 'onehand10k', exp_id=4,
        image_size=[256, 256], **_OVERRIDES,
    )
