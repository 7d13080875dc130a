"""Target encoding: Gaussian heatmaps (MSRA / unbiased-DARK / UDP), SimDR 1-D
vectors, and SRHandNet region maps.

The reference paints per-joint Gaussian windows with numpy slicing inside
python loops (datasets/data_pipeline/generateTarget.py:74-243,
generate_simder.py:9-31). Here each encoder is a single broadcast expression
over the full map — identical values (the windowed paint is equivalent to a
full-map Gaussian masked to the window) — so it jits, vmaps over the batch,
and runs on-device.

Layout: heatmaps are channels-last ``[H, W, K]`` (NHWC batch-wise), the
TPU-native layout. Tests transpose when comparing against the reference's
``[K, H, W]``.

All coordinate quantization uses ``jnp.trunc`` to reproduce python's
``int()`` (truncation toward zero, reference generateTarget.py:130-131).
"""

from __future__ import annotations

import jax.numpy as jnp


def _grids(height: int, width: int):
    xs = jnp.arange(width, dtype=jnp.float32)[None, :, None]   # [1, W, 1]
    ys = jnp.arange(height, dtype=jnp.float32)[:, None, None]  # [H, 1, 1]
    return xs, ys


def msra_heatmaps(
    joints: jnp.ndarray,
    visibility: jnp.ndarray,
    image_size,
    heatmap_size,
    sigma: float = 2.0,
    unbiased: bool = False,
    joint_weights: jnp.ndarray | None = None,
):
    """MSRA Gaussian heatmap targets (reference: generateTarget.py:74-159).

    Args:
        joints: [K, 2] keypoints in input-image pixels (x, y).
        visibility: [K] visibility flags (0/1).
        image_size: (w, h) static input size.
        heatmap_size: (w, h) static heatmap size.
        sigma: Gaussian sigma in heatmap pixels.
        unbiased: DARK unbiased encoding — full-map Gaussian at the exact
            (non-quantized) center (reference: generateTarget.py:100-123).
        joint_weights: optional [K] per-joint loss weights.

    Returns:
        (target [H, W, K] float32, weight [K] float32)
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    joints = jnp.asarray(joints, jnp.float32)[..., :2]
    vis = jnp.asarray(visibility, jnp.float32).reshape(-1)
    stride = jnp.array(
        [image_size[0] / W, image_size[1] / H], jnp.float32
    )
    tmp_size = sigma * 3.0

    mu_exact = joints / stride  # [K, 2]
    if unbiased:
        mu = mu_exact
        center = mu_exact
    else:
        # int(x + 0.5) truncates toward zero.
        mu = jnp.trunc(mu_exact + 0.5)
        center = mu

    # Window bounds; out-of-bounds window zeroes the weight
    # (reference: generateTarget.py:108-114, 132-136).
    ul = mu - tmp_size
    br = mu + tmp_size + 1.0
    if not unbiased:
        ul = jnp.trunc(ul)
        br = jnp.trunc(br)
    in_bounds = (
        (ul[:, 0] < W) & (ul[:, 1] < H) & (br[:, 0] >= 0) & (br[:, 1] >= 0)
    )
    weight = vis * in_bounds.astype(jnp.float32)

    xs, ys = _grids(H, W)  # [1,W,1], [H,1,1]
    cx = center[:, 0][None, None, :]
    cy = center[:, 1][None, None, :]
    g = jnp.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2.0 * sigma**2))

    if not unbiased:
        # Mask to the painted window [max(0,ul), min(br, size)).
        win = (
            (xs >= ul[:, 0][None, None, :])
            & (xs < br[:, 0][None, None, :])
            & (ys >= ul[:, 1][None, None, :])
            & (ys < br[:, 1][None, None, :])
        )
        g = jnp.where(win, g, 0.0)

    painted = (weight > 0.5).astype(jnp.float32)[None, None, :]
    target = g * painted

    if joint_weights is not None:
        weight = weight * jnp.asarray(joint_weights, jnp.float32).reshape(-1)
    return target.astype(jnp.float32), weight


def udp_heatmaps(
    joints: jnp.ndarray,
    visibility: jnp.ndarray,
    image_size,
    heatmap_size,
    sigma: float = 2.0,
    joint_weights: jnp.ndarray | None = None,
):
    """UDP Gaussian heatmaps (reference: generateTarget.py:162-243).

    Same as MSRA-quantized but with stride ``(image-1)/(heatmap-1)`` and the
    Gaussian centered at the exact sub-pixel location while the paint window
    stays anchored at the quantized center.
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    joints = jnp.asarray(joints, jnp.float32)[..., :2]
    vis = jnp.asarray(visibility, jnp.float32).reshape(-1)
    stride = jnp.array(
        [
            (image_size[0] - 1.0) / (W - 1.0),
            (image_size[1] - 1.0) / (H - 1.0),
        ],
        jnp.float32,
    )
    tmp_size = sigma * 3.0

    mu_exact = joints / stride
    mu = jnp.trunc(mu_exact + 0.5)
    ul = jnp.trunc(mu - tmp_size)
    br = jnp.trunc(mu + tmp_size + 1.0)
    in_bounds = (
        (ul[:, 0] < W) & (ul[:, 1] < H) & (br[:, 0] >= 0) & (br[:, 1] >= 0)
    )
    weight = vis * in_bounds.astype(jnp.float32)

    xs, ys = _grids(H, W)
    cx = mu_exact[:, 0][None, None, :]
    cy = mu_exact[:, 1][None, None, :]
    g = jnp.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2.0 * sigma**2))
    win = (
        (xs >= ul[:, 0][None, None, :])
        & (xs < br[:, 0][None, None, :])
        & (ys >= ul[:, 1][None, None, :])
        & (ys < br[:, 1][None, None, :])
    )
    g = jnp.where(win, g, 0.0)
    painted = (weight > 0.5).astype(jnp.float32)[None, None, :]
    target = g * painted

    if joint_weights is not None:
        weight = weight * jnp.asarray(joint_weights, jnp.float32).reshape(-1)
    return target.astype(jnp.float32), weight


def simdr_targets(
    joints: jnp.ndarray,
    weight: jnp.ndarray,
    image_size,
    split_ratio: int = 2,
    sigma: float = 2.0,
):
    """SimDR 1-D classification targets (reference: generate_simder.py:9-31).

    Args:
        joints: [K, 2] keypoints in input-image pixels.
        weight: [K] target weights (paint iff > 0).
        image_size: (w, h) static input size.
        split_ratio: SimDR upsampling factor k.
        sigma: 1-D Gaussian sigma (in split units, NOT scaled by k).

    Returns:
        (target_x [K, W*k], target_y [K, H*k])
    """
    k = int(split_ratio)
    Wk, Hk = int(image_size[0] * k), int(image_size[1] * k)
    joints = jnp.asarray(joints, jnp.float32)[..., :2]
    w = (jnp.asarray(weight, jnp.float32).reshape(-1) > 0).astype(jnp.float32)

    mu = joints * k  # [K, 2]
    x = jnp.arange(Wk, dtype=jnp.float32)[None, :]
    y = jnp.arange(Hk, dtype=jnp.float32)[None, :]
    tx = jnp.exp(-((x - mu[:, :1]) ** 2) / (2.0 * sigma**2)) * w[:, None]
    ty = jnp.exp(-((y - mu[:, 1:2]) ** 2) / (2.0 * sigma**2)) * w[:, None]
    return tx.astype(jnp.float32), ty.astype(jnp.float32)


def region_map(
    bbox: jnp.ndarray,
    image_size,
    heatmap_size,
    sigma: float = 2.0,
    encoding: str = "MSRA",
    patch: str = "srhandnet",
):
    """SRHandNet 3-channel region map (reference: generateTarget.py:321-366).

    Channel 0: Gaussian at the bbox center. Channels 1/2: a patch at the
    center filled with the width/height ratios w/img_w, h/img_h.

    ``patch`` selects the patch extent: ``"srhandnet"`` paints the Gen-2
    5x5 square (generateTarget.py:358); ``"gen1"`` paints the Gen-1
    +-3*sigma window (data/handset/dataset_function.py:199-207) used by
    the center+SimDR workflow, whose evaluation (`eval.legacy_eval`)
    decodes the wh channels as a +-3*sigma window MEAN — the extents must
    match or the decoded size is diluted by the patch/window area ratio.
    Either way the stored VALUE is the ratio w/img (this repo's uniform
    convention; the reference Gen-1 stores w*hm/img — see
    tools/train_center_simdr.py for the exact scale bridge).

    Args:
        bbox: [4] (x, y, w, h) in input-image pixels.
        image_size: (w, h) static input size.
        heatmap_size: (w, h) static heatmap size.

    Returns:
        [H, W, 3] region map.
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    bbox = jnp.asarray(bbox, jnp.float32)
    center = bbox[:2] + bbox[2:] / 2.0
    wh = bbox[2:]

    if encoding.upper() == "MSRA":
        center_hm, _ = msra_heatmaps(
            center[None, :], jnp.ones((1,)), image_size, heatmap_size, sigma
        )
    else:
        center_hm, _ = udp_heatmaps(
            center[None, :], jnp.ones((1,)), image_size, heatmap_size, sigma
        )

    gamma = jnp.clip(wh / jnp.asarray(image_size, jnp.float32), 0.0, 1.0)
    feat_stride = jnp.array([W / image_size[0], H / image_size[1]], jnp.float32)
    cxy = center * feat_stride
    # 5x5 patch as in SRHandNet, or the Gen-1 +-3*sigma window
    tmp = 2.0 if patch == "srhandnet" else 3.0 * float(sigma)
    ul = jnp.trunc(cxy - tmp)
    br = jnp.trunc(cxy + tmp + 1.0)

    xs, ys = _grids(H, W)  # [1,W,1], [H,1,1]
    patch = (
        (xs >= ul[0]) & (xs < br[0]) & (ys >= ul[1]) & (ys < br[1])
    ).astype(jnp.float32)[..., 0]  # [H, W]
    wx = patch * gamma[0]
    hy = patch * gamma[1]
    return jnp.concatenate(
        [center_hm, wx[..., None], hy[..., None]], axis=-1
    )
