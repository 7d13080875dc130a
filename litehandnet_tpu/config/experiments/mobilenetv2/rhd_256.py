"""Experiment: mobilenetv2 on rhd (mobilenetv2/rhd_256)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'mobilenetv2', 'rhd', exp_id=27, image_size=256,
        **{},
    )
