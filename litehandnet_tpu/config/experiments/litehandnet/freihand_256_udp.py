"""Experiment: litehandnet on freihand (litehandnet/freihand_256_udp)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    return make_cfg(
        'litehandnet', 'freihand', exp_id=10, image_size=256,
        **{'PIPELINE.use_udp': True, 'PIPELINE.encoding': 'UDP', 'PIPELINE.unbiased_encoding': False},
    )
