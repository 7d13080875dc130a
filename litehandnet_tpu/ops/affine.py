"""Affine-transform math for top-down crops.

Re-implements the coordinate conventions of the reference
(datasets/data_pipeline/post_transforms.py:6-210) as pure jnp functions:

* ``get_affine_transform`` — the classic center/scale/rot crop matrix built
  from three point pairs (reference: post_transforms.py:101-156 via
  cv2.getAffineTransform). Here the 3x3 linear system is solved with
  ``jnp.linalg.solve``; batched via ``vmap``.
* ``get_warp_matrix`` — the UDP ("The Devil is in the Details", CVPR 2020)
  unbiased warp matrix (reference: post_transforms.py:52-80), closed form.
* ``transform_preds`` — heatmap coords -> original image coords
  (reference: post_transforms.py:6-48), fully batched.

The bbox "scale" is normalized by ``PIXEL_STD`` = 200 as in the reference
(base_dataset.py:133-162).
"""

from __future__ import annotations

import jax.numpy as jnp

PIXEL_STD = 200.0


def _rotate_point(pt: jnp.ndarray, angle_rad: jnp.ndarray) -> jnp.ndarray:
    """Rotate 2-vector(s) `pt` by `angle_rad` (counter-clockwise, y-down)."""
    sn, cs = jnp.sin(angle_rad), jnp.cos(angle_rad)
    x, y = pt[..., 0], pt[..., 1]
    return jnp.stack([x * cs - y * sn, x * sn + y * cs], axis=-1)


def _get_3rd_point(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Third triangle point: rotate (a-b) by 90° CCW around b."""
    direction = a - b
    return b + jnp.stack([-direction[..., 1], direction[..., 0]], axis=-1)


def get_affine_transform(
    center: jnp.ndarray,
    scale: jnp.ndarray,
    rot: jnp.ndarray,
    output_size,
    shift=(0.0, 0.0),
    inv: bool = False,
) -> jnp.ndarray:
    """Affine matrix mapping the (center, scale, rot) box to the output crop.

    Args:
        center: [..., 2] bbox center (x, y) in source-image pixels.
        scale: [..., 2] bbox scale (w, h) / PIXEL_STD.
        rot: [...] rotation in degrees.
        output_size: (w, h) static ints of the destination crop.
        shift: fractional shift of the source box.
        inv: if True, return the dst->src matrix instead.

    Returns:
        [..., 2, 3] affine matrix (float32).
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)
    shift = jnp.asarray(shift, jnp.float32)

    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[..., 0]
    dst_w = float(output_size[0])
    dst_h = float(output_size[1])

    rot_rad = jnp.pi * rot / 180.0
    zeros = jnp.zeros_like(src_w)
    src_dir = _rotate_point(
        jnp.stack([zeros, src_w * -0.5], axis=-1), rot_rad
    )
    dst_dir = jnp.broadcast_to(
        jnp.array([0.0, dst_w * -0.5], jnp.float32), src_dir.shape
    )

    src0 = center + scale_tmp * shift
    src1 = center + src_dir + scale_tmp * shift
    src2 = _get_3rd_point(src0, src1)
    src = jnp.stack([src0, src1, src2], axis=-2)  # [..., 3, 2]

    dst0 = jnp.broadcast_to(
        jnp.array([dst_w * 0.5, dst_h * 0.5], jnp.float32), src0.shape
    )
    dst1 = dst0 + dst_dir
    dst2 = _get_3rd_point(dst0, dst1)
    dst = jnp.stack([dst0, dst1, dst2], axis=-2)  # [..., 3, 2]

    if inv:
        src, dst = dst, src

    # Solve A @ M.T = dst for the 2x3 matrix M, with A = [src | 1].
    ones = jnp.ones(src.shape[:-1] + (1,), jnp.float32)
    A = jnp.concatenate([src, ones], axis=-1)  # [..., 3, 3]
    m_t = jnp.linalg.solve(A, dst)             # [..., 3, 2]
    return jnp.swapaxes(m_t, -1, -2)           # [..., 2, 3]


def get_warp_matrix(theta, size_input, size_dst, size_target) -> jnp.ndarray:
    """UDP unbiased warp matrix (reference: post_transforms.py:52-80).

    Args:
        theta: rotation in degrees (scalar or [...]).
        size_input: [..., 2] source image size (w, h).
        size_dst: (w, h) static destination size.
        size_target: [..., 2] ROI size in the source plane (w, h).

    Returns:
        [..., 2, 3] warp matrix.
    """
    theta = jnp.deg2rad(jnp.asarray(theta, jnp.float32))
    size_input = jnp.asarray(size_input, jnp.float32)
    size_target = jnp.asarray(size_target, jnp.float32)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    scale_x = float(size_dst[0]) / size_target[..., 0]
    scale_y = float(size_dst[1]) / size_target[..., 1]
    in_w, in_h = size_input[..., 0], size_input[..., 1]
    tw, th = size_target[..., 0], size_target[..., 1]

    m00 = cos_t * scale_x
    m01 = -sin_t * scale_x
    m02 = scale_x * (-0.5 * in_w * cos_t + 0.5 * in_h * sin_t + 0.5 * tw)
    m10 = sin_t * scale_y
    m11 = cos_t * scale_y
    m12 = scale_y * (-0.5 * in_w * sin_t - 0.5 * in_h * cos_t + 0.5 * th)
    row0 = jnp.stack([m00, m01, m02], axis=-1)
    row1 = jnp.stack([m10, m11, m12], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def affine_transform_points(points: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Apply a 2x3 affine matrix to points.

    Args:
        points: [..., N, 2].
        mat: [..., 2, 3] (batch dims must broadcast with points').

    Returns:
        [..., N, 2] transformed points.
    """
    points = jnp.asarray(points, jnp.float32)
    xy1 = jnp.concatenate(
        [points, jnp.ones(points.shape[:-1] + (1,), jnp.float32)], axis=-1
    )  # [..., N, 3]
    return jnp.einsum("...ij,...nj->...ni", mat, xy1)


def invert_affine(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert 2x3 affine matrices ([..., 2, 3] -> [..., 2, 3])."""
    A = mat[..., :2]                    # [..., 2, 2]
    t = mat[..., 2:]                    # [..., 2, 1]
    A_inv = jnp.linalg.inv(A)
    t_inv = -jnp.einsum("...ij,...jk->...ik", A_inv, t)
    return jnp.concatenate([A_inv, t_inv], axis=-1)


def transform_preds(
    coords: jnp.ndarray,
    center: jnp.ndarray,
    scale: jnp.ndarray,
    output_size,
    use_udp: bool = False,
) -> jnp.ndarray:
    """Map heatmap-space coords back to source-image pixels.

    Batched form of the reference's per-image loop
    (post_transforms.py:6-48; called from top_down_eval.py:456-458).

    Args:
        coords: [..., K, 2] predicted coords in heatmap space.
        center: [..., 2] bbox centers.
        scale: [..., 2] bbox scales (w, h) / PIXEL_STD.
        output_size: (w, h) static heatmap size.
        use_udp: unbiased data processing (stride = (s-1)/(o-1)).

    Returns:
        [..., K, 2] coords in source-image pixels.
    """
    coords = jnp.asarray(coords, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32) * PIXEL_STD
    if use_udp:
        scale_xy = scale / (
            jnp.asarray(output_size, jnp.float32) - 1.0
        )
    else:
        scale_xy = scale / jnp.asarray(output_size, jnp.float32)
    return (
        coords * scale_xy[..., None, :]
        + center[..., None, :]
        - scale[..., None, :] * 0.5
    )
