"""Image classifier factory (the reference's classification stub,
models/classification/classifier.py:5 — a 9-line torchvision getter).

Reuses the pose backbones with a pooled Dense head; for gesture
classification in the demo pipeline.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from litehandnet_tpu.models.simplebaseline import CBL, InvertedResidual, make_divisible


class ImageClassifier(nn.Module):
    """MobileNetV2-style classifier: backbone -> GAP -> Dense."""

    num_classes: int = 1000
    widen_factor: float = 1.0
    axis_name: Optional[str] = None
    dtype: Any = None

    ARCH = (
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
    )

    @classmethod
    def from_config(cls, cfg, deploy: bool = False, axis_name=None, dtype=None):
        del deploy
        return cls(
            num_classes=cfg.MODEL.get("num_classes", 1000),
            widen_factor=cfg.MODEL.get("widen_factor", 1.0),
            axis_name=axis_name, dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = CBL(
            make_divisible(32 * self.widen_factor, 8), 3, 2, 1,
            name="conv1", **kw,
        )(x, train)
        for i, (expand, channel, blocks, stride) in enumerate(self.ARCH):
            out_ch = make_divisible(channel * self.widen_factor, 8)
            for b in range(blocks):
                x = InvertedResidual(
                    out_ch, stride if b == 0 else 1, expand,
                    name=f"layer{i + 1}_{b}", **kw,
                )(x, train)
        x = CBL(int(1280 * max(self.widen_factor, 1.0)), name="conv2", **kw)(
            x, train
        )
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="head")(x).astype(jnp.float32)
