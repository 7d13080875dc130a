"""Experiment mirroring reference config/resnet/_1_penoptic_256x256_dark_resnet50.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'MODEL.stem_channels': 64,
            'MODEL.base_channels': 64,
            'MODEL.strides': (1, 2, 2, 2),
            'MODEL.deep_stem': False,
            'MODEL.num_stages': 4,
            'MODEL.out_indices': (3,),
            'MODEL.pred_bbox': True,
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
        'resnet', 'panoptic', exp_id=1,
        image_size=[256, 256], **_OVERRIDES,
    )
