"""Spatial-partitioning (SP) serving — the batch-1 latency mode.

Data-parallel sharding (the only distribution the reference has:
``nn.DataParallel`` over the eval batch, test.py:81) cannot reduce the
latency of a SINGLE request below one device's forward time. On TPU the
idiomatic alternative is to partition the image's **height** axis across
the mesh and let XLA's GSPMD derive the communication: every convolution
computes a height band per device, and the compiler inserts halo
exchanges (neighbour ``ppermute`` rings over ICI) for the kernel rows a
band needs from its neighbours. Nothing in the model changes — the
sharding is expressed as constraints around the jitted forward, and the
decode's global argmax/DARK refinement runs on the gathered heatmap.

This is a new capability, not a port: the reference cannot express it
(NCCL DDP has no spatial partitioning), and it exists here precisely
because the compute path is jit + ``jax.sharding`` rather than explicit
collectives.

Numerics: partitioned convolutions compute the same local windows as the
unpartitioned ones, so results match the single-device forward to f32
reduction-order noise (asserted ≤5e-3 px end-to-end in
tests/test_spatial_serving.py and the ``dryrun_multichip`` spatial leg).

Shape rule: the input height must be divisible by the mesh axis size
(true for every config in the corpus on meshes of 2/4/8: sizes are
multiples of 32). GSPMD would pad otherwise; we assert instead so the
fast path is never silently padded.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from litehandnet_tpu.ops.decode import keypoints_from_heatmaps
from litehandnet_tpu.train.distributed import DATA_AXIS


def spatial_spec(axis: str = DATA_AXIS) -> P:
    """PartitionSpec for an NHWC image sharded over H."""
    return P(None, axis, None, None)


def make_spatial_serve(
    model,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    post_process: Optional[str] = "unbiased",
    kernel: int = 11,
):
    """Build the jitted SP serving function.

    Args:
        model: a deploy-mode flax model (``get_model(cfg, deploy=True)``).
        mesh: the device mesh; its ``axis`` dimension partitions H.
        axis: mesh axis name to partition over.
        post_process: decode refinement (None | 'default' | 'unbiased').
        kernel: DARK modulation kernel.

    Returns:
        ``serve(variables, img, centers, scales) -> (preds, maxvals)``:
        inputs and outputs replicated; internally the forward runs
        height-sharded over the mesh.
    """
    n_shards = mesh.shape[axis]
    img_sh = NamedSharding(mesh, spatial_spec(axis))
    repl = NamedSharding(mesh, P())

    def serve(variables, img, centers, scales):
        assert img.shape[1] % n_shards == 0, (
            f"height {img.shape[1]} not divisible by mesh axis "
            f"'{axis}'={n_shards}")
        img = lax.with_sharding_constraint(img, img_sh)
        hm = model.apply(variables, img, train=False)
        if isinstance(hm, (list, tuple)):
            hm = hm[-1]
        # gather the full heatmap for the global argmax + DARK refinement
        hm = lax.with_sharding_constraint(hm, repl)
        _, preds, maxvals = keypoints_from_heatmaps(
            hm, centers, scales, post_process=post_process, kernel=kernel)
        return preds, maxvals

    return jax.jit(
        serve,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(repl, repl),
    )
