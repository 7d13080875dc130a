"""Experiment mirroring reference config/srhandnet/_1_rhd2d_256x256.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.output_channel': 21,
            'MODEL.pred_bbox': False,
            'PIPELINE.unbiased_encoding': False,
            'CHECKPOINT.load_best': True,
            'TRAIN.syncBN': False,
            'TRAIN.batch_per_gpu': 16,
            'OPTIMIZER.warmup_steps': 210,
            'LOSS.type': 'srhandnetloss',
            'LOSS.loss_weight': [0.3, 0.3, 0.5, 1.0],
        }


def _get_cfg():
    return make_cfg(
        'srhandnet', 'rhd', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
