"""Fused on-device preprocessing: augmentation + target encoding as ONE
jitted batched function.

TPU-native replacement for the reference's per-sample cv2/numpy transform
pipeline running in DataLoader workers (datasets/data_pipeline/, call stack
SURVEY.md §3.3): the host only decodes JPEGs into a fixed-size canvas; the
crop/flip/HSV/scale-rot/normalize/encode chain is a single XLA program over
the whole batch.

Semantics per reference transform:
* TopDownGetRandomScaleRotation (topdown_affine.py:11-45): scale ~
  clip(N(1, sf), 1-sf, 1+sf); rot ~ clip(N(0, rf), -2rf, 2rf) kept with
  prob rot_prob.
* TopDownAffine (topdown_affine.py:47-115): classic center/scale/rot crop
  (or UDP warp), bilinear, zero border — here as inverse-matrix gather.
* HSVRandomAug (random_hsv.py:5-44): YOLOX-style HSV gains (+-5, +-30, +-30
  on an OpenCV-scaled HSV space).
* TopDownRandomFlip (RandomFlip.py:11-131): horizontal mirror + flip_index
  reorder. DEVIATION: flips in crop space rather than source space — the
  augmentation distribution is identical; per-sample pixels differ only when
  the crop is off-center.
* ToTensor/NormalizeTensor: /255 then ImageNet mean/std
  (build_dataset.py:119).
* TopDownGenerateTarget / GenerateSimDR: litehandnet_tpu.ops.encode.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from litehandnet_tpu.ops.affine import (
    get_affine_transform,
    get_warp_matrix,
    invert_affine,
)
from litehandnet_tpu.ops.encode import (
    msra_heatmaps,
    region_map,
    simdr_targets,
    udp_heatmaps,
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _bilinear_sample(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample [H0, W0, C] at float coords [H, W, 2] (x, y); zero outside."""
    H0, W0, C = image.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < W0) & (yi >= 0) & (yi < H0)
        v = image[jnp.clip(yi, 0, H0 - 1), jnp.clip(xi, 0, W0 - 1)]
        return v * valid[..., None]

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def _rgb_to_hsv_cv(img: jnp.ndarray):
    """RGB [0,255] -> OpenCV-scaled HSV (H in [0,180), S/V in [0,255])."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-6) * 255.0, 0.0)
    safe = jnp.maximum(delta, 1e-6)
    h = jnp.where(
        maxc == r, (g - b) / safe,
        jnp.where(maxc == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = (h * 30.0) % 180.0
    return h, s, v


def _hsv_to_rgb_cv(h, s, v):
    h = (h % 180.0) / 30.0
    s = s / 255.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_augment(img: jnp.ndarray, key) -> jnp.ndarray:
    """YOLOX HSV aug on a [H, W, 3] RGB [0,255] image
    (reference: random_hsv.py:20-44): each channel's gain is gated on/off
    with p=1/2 (`hsv_gains *= np.random.randint(0, 2, 3)`) and truncated to
    an integer (`astype(np.int16)`) — half the samples keep each channel
    un-jittered, which the augmentation distribution depends on."""
    k_gain, k_gate = jax.random.split(key)
    gains = jax.random.uniform(
        k_gain, (3,), minval=-1.0, maxval=1.0
    ) * jnp.float32([5.0, 30.0, 30.0])
    gate = jax.random.randint(k_gate, (3,), 0, 2).astype(jnp.float32)
    gains = jnp.trunc(gains * gate)
    h, s, v = _rgb_to_hsv_cv(img)
    h = (h + gains[0]) % 180.0
    s = jnp.clip(s + gains[1], 0.0, 255.0)
    v = jnp.clip(v + gains[2], 0.0, 255.0)
    return _hsv_to_rgb_cv(h, s, v)


class DevicePipeline:
    """Batched jit pipeline factory.

    Args:
        cfg: experiment config (PIPELINE/DATASET sections).
        flip_index: [K] permutation applied to joints on horizontal flip.
        is_train: enables flip/HSV/scale-rot augmentation.
    """

    def __init__(self, cfg, flip_index: Sequence[int], is_train: bool = True,
                 with_region: bool = None):
        p = cfg.PIPELINE
        d = cfg.DATASET
        m = cfg.get("MODEL", {})
        if with_region is None:
            with_region = bool(
                m.get("pred_bbox", False) or m.get("with_region_map", False)
            )
        self.with_region = with_region
        # patch extent: the Gen-1 center+SimDR workflow (with_region_map,
        # data/handset/dataset_function.py:199-207) paints +-3*sigma; the
        # Gen-2 SRHandNet workflow (pred_bbox) paints 5x5
        self.region_patch = (
            "gen1"
            if m.get("with_region_map", False) and not m.get("pred_bbox", False)
            else "srhandnet"
        )
        self.image_size = tuple(int(v) for v in d.image_size)
        hm = d.heatmap_size
        # multi-scale targets (SRHandNet): heatmap_size is a list of pairs
        # and sigma a list (reference: SRHandNetGenerateTarget,
        # generateTarget.py:369-426)
        self.multiscale = bool(hm and isinstance(hm[0], (list, tuple)))
        if self.multiscale:
            self.heatmap_sizes = [tuple(int(v) for v in h) for h in hm]
            self.heatmap_size = self.heatmap_sizes[-1]
        else:
            self.heatmap_sizes = None
            self.heatmap_size = tuple(int(v) for v in hm)
        self.flip_index = tuple(int(i) for i in flip_index)
        self.is_train = is_train
        self.flip_prob = float(p.get("flip_prob", 0.5)) if is_train else 0.0
        self.rot_prob = float(p.get("rot_prob", 0.0)) if is_train else 0.0
        self.rot_factor = float(p.get("rot_factor", 0.0))
        self.scale_factor = float(p.get("scale_factor", 0.0)) if is_train else 0.0
        self.use_udp = bool(p.get("use_udp", False))
        self.sigma = p.get("sigma", 2)
        self.unbiased = bool(p.get("unbiased_encoding", False))
        self.encoding = p.get("encoding", "MSRA")
        self.simdr_split_ratio = int(p.get("simdr_split_ratio", 0) or 0)
        if self.multiscale and self.simdr_split_ratio > 0:
            # the SimDR branch reads the single-scale per-joint weights and
            # a scalar sigma; no reference config combines it with
            # SRHandNet-style multi-scale targets either
            raise ValueError(
                "simdr_split_ratio > 0 is not supported with multi-scale "
                "heatmap_size (nested lists)"
            )
        self.hsv = bool(is_train)
        self._fn = jax.jit(self._build())

    def _build(self):
        W, H = self.image_size
        flip_index = jnp.asarray(self.flip_index, jnp.int32)

        def per_sample(image, joints, vis, center, scale, rotation, bbox, key):
            k_s, k_r, k_rot, k_flip, k_hsv = jax.random.split(key, 5)

            # scale/rot sampling (TopDownGetRandomScaleRotation) — two
            # INDEPENDENT normal draws, as in topdown_affine.py:36-40
            sf, rf = self.scale_factor, self.rot_factor
            s_mult = jnp.clip(
                jax.random.normal(k_s) * sf + 1.0, 1.0 - sf, 1.0 + sf
            )
            rot = jnp.clip(jax.random.normal(k_r) * rf, -2.0 * rf, 2.0 * rf)
            rot = jnp.where(
                jax.random.uniform(k_rot) <= self.rot_prob, rot, 0.0
            )
            if not self.is_train:
                # eval: no sampling; honor the caller-provided rotation
                # (0 in the reference val pipeline)
                rot = rotation
            scale = scale * s_mult

            # affine crop: dst->src matrix, bilinear gather
            if self.use_udp:
                # ONE matrix for joints AND pixels, exactly as the reference
                # (topdown_affine.py:76: get_warp_matrix(r, c*2.0,
                # image_size-1.0, s*200.0); cv2.warpAffine inverts it
                # internally to sample the source).
                fwd = get_warp_matrix(
                    rot, center * 2.0, (W - 1.0, H - 1.0), scale * 200.0
                )
                inv = invert_affine(fwd)
            else:
                fwd = get_affine_transform(center, scale, rot, (W, H))
                inv = get_affine_transform(center, scale, rot, (W, H), inv=True)

            ys = jnp.arange(H, dtype=jnp.float32)
            xs = jnp.arange(W, dtype=jnp.float32)
            grid = jnp.stack(
                jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
            )  # [H, W, 2]
            ones = jnp.ones((H, W, 1), jnp.float32)
            src = jnp.einsum(
                "ij,hwj->hwi", inv, jnp.concatenate([grid, ones], axis=-1)
            )
            img = _bilinear_sample(image.astype(jnp.float32), src)

            # joints into crop space
            xy1 = jnp.concatenate(
                [joints, jnp.ones((joints.shape[0], 1), jnp.float32)], axis=-1
            )
            joints_c = jnp.einsum("ij,kj->ki", fwd, xy1)

            # flip in crop space
            do_flip = jax.random.uniform(k_flip) <= self.flip_prob
            img = jnp.where(do_flip, img[:, ::-1, :], img)
            flipped_joints = jnp.concatenate(
                [(W - 1.0) - joints_c[:, :1], joints_c[:, 1:]], axis=-1
            )[flip_index]
            joints_c = jnp.where(do_flip, flipped_joints, joints_c)
            vis = jnp.where(do_flip, vis[flip_index], vis)

            # HSV augmentation
            if self.hsv:
                img = hsv_augment(img, k_hsv)

            # normalize
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(IMAGENET_STD, jnp.float32)
            img = (img / 255.0 - mean) / std

            # targets
            sigmas = (
                list(self.sigma) if isinstance(self.sigma, (list, tuple))
                else [self.sigma]
            )

            def encode_at(hm_size, sig):
                if self.encoding.upper() == "UDP":
                    return udp_heatmaps(
                        joints_c, vis, self.image_size, hm_size, float(sig)
                    )
                return msra_heatmaps(
                    joints_c, vis, self.image_size, hm_size, float(sig),
                    unbiased=self.unbiased,
                )

            if self.multiscale:
                if len(sigmas) == 1:
                    sigmas = sigmas * len(self.heatmap_sizes)
                targets, weights = [], []
                for hm_size, sig in zip(self.heatmap_sizes, sigmas):
                    t, w = encode_at(hm_size, sig)
                    targets.append(t)
                    weights.append(w)
                target, weight = targets, weights
            elif len(sigmas) > 1:
                # stacked-sigma (hourglass intermediate supervision,
                # reference generateTarget.py:252-292): one [H, W, K] map
                # per sigma, stacked to [S, H, W, K] to match the model's
                # [B, S, H, W, K] output; visibility is sigma-independent
                # so the weight stays [K]
                pairs = [encode_at(self.heatmap_size, s) for s in sigmas]
                target = jnp.stack([t for t, _ in pairs])
                weight = pairs[0][1]
            else:
                target, weight = encode_at(self.heatmap_size, sigmas[0])
            out = dict(
                img=img, target=target, target_weight=weight,
                joints=joints_c, center=center, scale=scale,
            )
            if self.with_region:
                # warp the source bbox into crop space: ALL FOUR corners
                # through the affine, then the axis-aligned bound — exact
                # under rotation too (pred_bbox configs force rotation off,
                # config/__init__.py:103-107, but with_region_map configs
                # like mynet_stacked keep rot_prob > 0, where a two-corner
                # diagonal does not bound the rotated rectangle)
                x0, y0 = bbox[0], bbox[1]
                x1, y1 = bbox[0] + bbox[2], bbox[1] + bbox[3]
                corners = jnp.stack([
                    jnp.stack([x0, y0]), jnp.stack([x1, y0]),
                    jnp.stack([x0, y1]), jnp.stack([x1, y1]),
                ])
                xy1 = jnp.concatenate([corners, jnp.ones((4, 1))], axis=-1)
                warped = jnp.einsum("ij,kj->ki", fwd, xy1)
                x_lo, x_hi = jnp.min(warped[:, 0]), jnp.max(warped[:, 0])
                y_lo, y_hi = jnp.min(warped[:, 1]), jnp.max(warped[:, 1])
                # account for a horizontal flip of the crop
                x_lo = jnp.where(do_flip, (W - 1.0) - x_hi, x_lo)
                bbox_c = jnp.stack([x_lo, y_lo, x_hi - x_lo, y_hi - y_lo])
                sig0 = (
                    float(self.sigma[0])
                    if isinstance(self.sigma, (list, tuple))
                    else float(self.sigma)
                )
                if self.multiscale:
                    target = [
                        jnp.concatenate([
                            t,
                            region_map(bbox_c, self.image_size, hm_size,
                                       sig0, encoding=self.encoding,
                                       patch=self.region_patch),
                        ], axis=-1)
                        for t, hm_size in zip(target, self.heatmap_sizes)
                    ]
                    weight = [
                        jnp.concatenate([w, jnp.ones(3)], axis=0)
                        for w in weight
                    ]
                else:
                    rmap = region_map(
                        bbox_c, self.image_size, self.heatmap_size, sig0,
                        encoding=self.encoding, patch=self.region_patch,
                    )
                    if target.ndim == 4:  # stacked-sigma [S, H, W, K]
                        rmap = jnp.broadcast_to(
                            rmap, target.shape[:1] + rmap.shape
                        )
                    target = jnp.concatenate([target, rmap], axis=-1)
                    weight = jnp.concatenate([weight, jnp.ones(3)], axis=0)
                out.update(target=target, target_weight=weight, bbox=bbox_c)
            if self.simdr_split_ratio > 0:
                sx, sy = simdr_targets(
                    joints_c, weight[: joints_c.shape[0]], self.image_size,
                    self.simdr_split_ratio, float(self.sigma),
                )
                out["simdr_x"] = sx
                out["simdr_y"] = sy
            return out

        def batch_fn(images, joints, vis, centers, scales, rotations, bboxes,
                     key):
            keys = jax.random.split(key, images.shape[0])
            return jax.vmap(per_sample)(
                images, joints, vis, centers, scales, rotations, bboxes, keys
            )

        return batch_fn

    def __call__(self, images, joints, vis, centers, scales, rotations, key,
                 bboxes=None):
        """Run the fused pipeline.

        Args:
            images: [B, H0, W0, 3] uint8 (host canvas).
            joints: [B, K, 2] float32 source-image coords.
            vis: [B, K] float32.
            centers, scales: [B, 2].
            rotations: [B] (unused; sampling is on-device).
            key: PRNGKey.

        Returns:
            batch dict with img / target / target_weight (+ simdr_x/y;
            + bbox and K+3 target channels when with_region).
        """
        import numpy as np

        if bboxes is None:
            bboxes = np.zeros((np.shape(images)[0], 4), np.float32)
        return self._fn(
            images, joints, vis, centers, scales, rotations, bboxes, key
        )
