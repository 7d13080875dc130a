"""Loss registry (reference surface: loss/__init__.py:18-19)."""

from litehandnet_tpu.losses.losses import (  # noqa: F401
    CenterSimdrLoss,
    KLDiscretLoss,
    SimDRLoss,
    SRHandNetLoss,
    TopdownHeatmapLoss,
    centernet_focal_loss,
    distance_loss,
    focal_loss,
    joints_distance_loss,
    kl_discret_loss,
    kl_focal_loss,
    mask_loss,
    reg_l1_loss,
    region_loss,
)


def get_loss(cfg):
    """Build the criterion module named by ``cfg.LOSS.type``.

    Returns a Flax module: ``criterion.apply(vars, outputs, batch)`` ->
    ``(scalar_loss, {name: scalar})``. Criterion params (SimDR linear
    decoders, auto-weight MTL params) are trained alongside the model, the
    functional analogue of the reference appending criterion params to the
    optimizer (train/optimizer_scheduler.py:8-10).
    """
    name = cfg.LOSS.type.lower()
    if name == "srhandnetloss":
        return SRHandNetLoss.from_config(cfg)
    if name == "topdownheatmaploss":
        return TopdownHeatmapLoss.from_config(cfg)
    if name == "centersimdrloss":
        return CenterSimdrLoss.from_config(cfg)
    raise KeyError(f"unknown loss {cfg.LOSS.type!r}")
