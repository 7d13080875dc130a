"""Experiment mirroring reference config/litehandnet/freihand/_1_freihand_224x244_dark_h4_ca_r4_leaky.py (same knobs; dataset
paths follow this repo's canonical layout)."""

from litehandnet_tpu.config.templates import make_cfg

_OVERRIDES = {
            'PIPELINE.rot_prob': 0,
            'PIPELINE.rot_factor': 0,
        }


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=1,
        image_size=[224, 224], **_OVERRIDES,
    )
