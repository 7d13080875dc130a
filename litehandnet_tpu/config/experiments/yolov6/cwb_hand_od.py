"""Experiment: YOLOv6-lite hand detector on COCO-WholeBody hand boxes."""

from litehandnet_tpu.config.templates import make_cfg


def _get_cfg():
    cfg = make_cfg("srhandnet", "coco_wholebody_hand", exp_id=102,
                   image_size=256)
    cfg["MODEL"] = dict(name="yolov6", num_classes=1, width_multiple=0.25)
    cfg["LOSS"] = dict(type="TopdownHeatmapLoss", loss_weight=[1.0],
                       auto_weight=False)
    return cfg
