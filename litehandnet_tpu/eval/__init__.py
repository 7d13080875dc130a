"""Evaluation: keypoint metrics, decoder wrapper, detection AP."""

from litehandnet_tpu.eval.metrics import (  # noqa: F401
    keypoint_auc,
    keypoint_epe,
    keypoint_pck_accuracy,
)
from litehandnet_tpu.eval.decoder import TopDownDecoder  # noqa: F401
from litehandnet_tpu.eval.spatial_serving import (  # noqa: F401
    make_spatial_serve,
    spatial_spec,
)
from litehandnet_tpu.eval.legacy_eval import (  # noqa: F401
    cs_from_region_map,
    evaluate_ap,
    heatmap_pck,
    non_max_suppression,
)
