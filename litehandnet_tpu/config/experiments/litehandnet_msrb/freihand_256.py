"""Experiment: litehandnet_msrb on freihand (MSRB/shuffle-unit variant)."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    cfg = make_cfg("litehandnet", "freihand", exp_id=101, image_size=256)
    cfg["MODEL"] = dict(
        name="litehandnet_msrb", num_stage=4, input_channel=128,
        msrb_ca="ca", rbu_ca="ca", output_channel=21,
    )
    return cfg
