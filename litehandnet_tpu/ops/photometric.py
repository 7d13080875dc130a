"""Legacy photometric / geometric augmentation ops (Gen-1 lineage), jnp.

Reference: utils/data_augmentation.py:14-175 — gamma adjust, sigmoid
contrast, homography warp with bbox, horizontal flip, central scale. Kept as
standalone jittable functions for the Gen-1 workflow and general use; the
main training path uses data/device_pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adjust_gamma(img: jnp.ndarray, gamma: float = 1.0) -> jnp.ndarray:
    """Gamma correction on [0, 255] images (reference :14-30)."""
    img = jnp.clip(img, 0.0, 255.0) / 255.0
    return jnp.power(img, gamma) * 255.0


def adjust_sigmoid(img: jnp.ndarray, cutoff: float = 0.5,
                   gain: float = 10.0) -> jnp.ndarray:
    """Sigmoid contrast adjustment (reference :33-47)."""
    img = jnp.clip(img, 0.0, 255.0) / 255.0
    return 255.0 / (1.0 + jnp.exp(gain * (cutoff - img)))


def horizontal_flip(img: jnp.ndarray, joints: jnp.ndarray,
                    flip_index) -> tuple:
    """Mirror image + joints (reference :96-118)."""
    W = img.shape[1]
    flipped = img[:, ::-1]
    j = joints.at[..., 0].set(W - 1.0 - joints[..., 0])
    return flipped, j[jnp.asarray(flip_index)]


def central_scale(img: jnp.ndarray, joints: jnp.ndarray,
                  scale: float) -> tuple:
    """Zoom about the image center (reference :150-175) via the shared
    affine machinery."""
    from litehandnet_tpu.ops.affine import get_affine_transform
    from litehandnet_tpu.data.device_pipeline import _bilinear_sample

    H, W = img.shape[:2]
    center = jnp.float32([W / 2, H / 2])
    s = jnp.float32([W / 200.0 / scale, H / 200.0 / scale])
    inv = get_affine_transform(center, s, 0.0, (W, H), inv=True)
    fwd = get_affine_transform(center, s, 0.0, (W, H))
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    src = jnp.einsum(
        "ij,hwj->hwi", inv,
        jnp.concatenate([grid, jnp.ones((H, W, 1))], axis=-1),
    )
    warped = _bilinear_sample(img.astype(jnp.float32), src)
    xy1 = jnp.concatenate(
        [joints[..., :2], jnp.ones(joints.shape[:-1] + (1,))], axis=-1
    )
    return warped, jnp.einsum("ij,kj->ki", fwd, xy1)


def homography_warp(img: jnp.ndarray, joints: jnp.ndarray,
                    matrix: jnp.ndarray) -> tuple:
    """Full 3x3 homography warp of image + joints (reference :50-93)."""
    from litehandnet_tpu.data.device_pipeline import _bilinear_sample

    H, W = img.shape[:2]
    inv = jnp.linalg.inv(matrix)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    xy1 = jnp.concatenate([grid, jnp.ones((H, W, 1))], axis=-1)
    src_h = jnp.einsum("ij,hwj->hwi", inv, xy1)
    src = src_h[..., :2] / jnp.maximum(jnp.abs(src_h[..., 2:]), 1e-6) * jnp.sign(src_h[..., 2:])
    warped = _bilinear_sample(img.astype(jnp.float32), src)
    j1 = jnp.concatenate(
        [joints[..., :2], jnp.ones(joints.shape[:-1] + (1,))], axis=-1
    )
    jw = jnp.einsum("ij,kj->ki", matrix, j1)
    return warped, jw[..., :2] / jnp.maximum(jnp.abs(jw[..., 2:]), 1e-6) * jnp.sign(jw[..., 2:])


def mosaic4(images: jnp.ndarray, joints: jnp.ndarray, vis: jnp.ndarray,
            key, out_size: int) -> tuple:
    """YOLOX-style 4-image mosaic (reference:
    datasets/data_pipeline/mosaic.py:9-275), fixed-shape: four [S, S] crops
    tile a [2S, 2S] canvas centered at a jittered point, then the canvas is
    resized to out_size.

    Args:
        images: [4, S, S, 3]; joints: [4, K, 2]; vis: [4, K].

    Returns:
        (mosaic [out, out, 3], joints [4K, 2], vis [4K])
    """
    S = images.shape[1]
    # jittered mosaic center in [0.5S, 1.5S] (reference mosaic.py picks the
    # joint point of the four images uniformly in the canvas middle half);
    # image i touches the center from its quadrant side and is clipped at
    # the canvas border — realized fixed-shape by compositing on a padded
    # 3S canvas (every placement stays in bounds) and slicing the central
    # 2S window, which equals border clipping
    kx, ky = jax.random.split(key)
    cx = jax.random.randint(kx, (), S // 2, S + S // 2 + 1)
    cy = jax.random.randint(ky, (), S // 2, S + S // 2 + 1)
    offsets = jnp.stack([
        jnp.stack([cx - S, cy - S]), jnp.stack([cx, cy - S]),
        jnp.stack([cx - S, cy]), jnp.stack([cx, cy]),
    ])  # [4, 2] canvas coords of each image's top-left corner
    pad = S // 2
    canvas3 = jnp.zeros((3 * S, 3 * S, 3), images.dtype)
    for i in range(4):
        canvas3 = jax.lax.dynamic_update_slice(
            canvas3, images[i], (offsets[i, 1] + pad, offsets[i, 0] + pad, 0)
        )
    canvas = jax.lax.dynamic_slice(canvas3, (pad, pad, 0), (2 * S, 2 * S, 3))
    all_joints = jnp.concatenate(
        [joints[i] + offsets[i][None, :].astype(joints.dtype)
         for i in range(4)], axis=0,
    )
    all_vis = jnp.concatenate([vis[i] for i in range(4)], axis=0)
    # joints clipped off the canvas become invisible (reference filters
    # labels to the mosaic bounds)
    inside = (
        (all_joints[:, 0] >= 0) & (all_joints[:, 0] < 2 * S)
        & (all_joints[:, 1] >= 0) & (all_joints[:, 1] < 2 * S)
    )
    all_vis = all_vis * inside.astype(all_vis.dtype)
    scale = out_size / (2.0 * S)
    out = jax.image.resize(
        canvas.astype(jnp.float32), (out_size, out_size, 3), method="bilinear"
    )
    return out, all_joints * scale, all_vis
