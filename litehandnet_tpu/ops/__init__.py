"""Core numerical ops: affine math, target encoding, decoding, image warping.

Everything here is pure-functional jax.numpy, designed to be `jit`-compiled and
`vmap`-batched; the per-joint / per-image python loops of the reference
(e.g. generateTarget.py:100-158, top_down_eval.py:437-452) become broadcast
expressions over full tensors.
"""

from litehandnet_tpu.ops.affine import (  # noqa: F401
    get_affine_transform,
    get_warp_matrix,
    affine_transform_points,
    transform_preds,
    invert_affine,
)
from litehandnet_tpu.ops.encode import (  # noqa: F401
    msra_heatmaps,
    udp_heatmaps,
    simdr_targets,
    region_map,
)
from litehandnet_tpu.ops.decode import (  # noqa: F401
    argmax_coords,
    refine_default,
    refine_offset_gen1,
    refine_dark,
    refine_dark_udp,
    keypoints_from_heatmaps,
    keypoints_from_simdr,
)
