"""cv2-compatible Gaussian blur as a separable depthwise XLA convolution.

DARK decoding modulates heatmaps with ``cv2.GaussianBlur(ksize, sigmaX=0)``
(reference: top_down_eval.py:233-272, 303-305). For exact parity:

* sigma for ``sigmaX=0``: ``0.3*((ksize-1)*0.5 - 1) + 0.8`` (OpenCV rule);
* ksize in {1, 3, 5, 7} uses OpenCV's fixed binomial tables;
* the classic DARK path zero-pads by (ksize-1)//2, blurs, then rescales each
  map so its max matches the pre-blur max (top_down_eval.py:263-271);
* the UDP path uses OpenCV's default BORDER_REFLECT_101 padding
  (top_down_eval.py:303-305).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV small_gaussian_tab (fixed kernels used when sigma <= 0).
_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array(
        [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
        np.float32,
    ),
}


@functools.lru_cache(maxsize=None)
def cv2_gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """1-D Gaussian kernel matching ``cv2.getGaussianKernel(ksize, sigma)``."""
    assert ksize % 2 == 1, ksize
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN_TAB:
        return _SMALL_GAUSSIAN_TAB[ksize]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _sep_blur_nhwc(x: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable valid-conv blur of a padded [B, H, W, C] tensor."""
    C = x.shape[-1]
    k = jnp.asarray(k1d, x.dtype)
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, C))  # [k,1,1,C]
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, C))  # [1,k,1,C]
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, kw.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )


def gaussian_blur(
    heatmaps: jnp.ndarray,
    kernel: int = 11,
    border: str = "constant",
    preserve_max: bool = False,
) -> jnp.ndarray:
    """Blur heatmaps ([B, H, W, K]) with a cv2-compatible Gaussian.

    Args:
        heatmaps: [B, H, W, K].
        kernel: odd Gaussian kernel size (sigma derived by the OpenCV rule).
        border: 'constant' (zero pad, classic-DARK) or 'reflect'
            (BORDER_REFLECT_101, UDP-DARK).
        preserve_max: rescale each (B, K) map to its pre-blur max
            (classic-DARK semantics, top_down_eval.py:265-271).
    """
    if kernel == 1:
        return heatmaps
    pad = (kernel - 1) // 2
    k1d = cv2_gaussian_kernel(kernel, 0.0)
    mode = "reflect" if border == "reflect" else "constant"
    padded = jnp.pad(heatmaps, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    blurred = _sep_blur_nhwc(padded, k1d)
    if preserve_max:
        orig_max = jnp.max(heatmaps, axis=(1, 2), keepdims=True)
        new_max = jnp.max(blurred, axis=(1, 2), keepdims=True)
        blurred = blurred * (orig_max / jnp.maximum(new_max, 1e-20))
    return blurred
