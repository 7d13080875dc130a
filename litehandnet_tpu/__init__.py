"""litehandnet_tpu — a TPU-native (JAX/XLA/Pallas) hand-keypoint estimation framework.

A from-scratch rebuild of the capabilities of the reference PyTorch framework
(Runki2018/litehandnet): top-down 2D hand/body keypoint estimation with a config
system, COCO-format datasets, on-device fused preprocessing + Gaussian-heatmap /
SimDR target encoding, a zoo of CNN pose models (LiteHandNet flagship with
RepVGG-style functional re-parameterization), losses, a data-parallel trainer
over a `jax.sharding.Mesh`, and a fully batched decode/eval stack
(argmax + DARK/UDP sub-pixel refinement, PCK/AUC/EPE, center-map bbox AP).

Everything on the compute path is jit-compiled XLA; layouts are NHWC
(channels-last) to map onto the TPU MXU/VPU.
"""

__version__ = "0.1.0"

from litehandnet_tpu.config import get_config, pcfg  # noqa: F401
