"""Parity tests: batched decode vs the reference per-image numpy decode."""

import numpy as np
import pytest

from litehandnet_tpu.ops import decode as D
from litehandnet_tpu.ops.blur import gaussian_blur

from tests import ref_loader

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref():
    return ref_loader.load_top_down_eval()


def _fake_heatmaps(rng, B=4, K=21, H=56, W=56, sigma=2.0):
    """Gaussian blobs + noise, in reference layout [B, K, H, W]."""
    hm = np.zeros((B, K, H, W), np.float32)
    centers = rng.uniform(4, 50, size=(B, K, 2)).astype(np.float32)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    for b in range(B):
        for k in range(K):
            cx, cy = centers[b, k]
            hm[b, k] = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2))
    hm += rng.uniform(0, 0.01, size=hm.shape).astype(np.float32)
    return hm, centers


def _cs(rng, B):
    center = rng.uniform(100, 300, size=(B, 2)).astype(np.float32)
    scale = rng.uniform(0.8, 2.0, size=(B, 2)).astype(np.float32)
    return center, scale


def test_argmax_parity(ref, rng):
    hm, _ = _fake_heatmaps(rng)
    want_preds, want_vals = ref._get_max_preds(hm.copy())
    got_preds, got_vals = D.argmax_coords(np.transpose(hm, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_preds), want_preds, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_vals), want_vals, atol=1e-5)


def test_gaussian_blur_parity(ref, rng):
    hm, _ = _fake_heatmaps(rng, B=2, K=3)
    want = ref._gaussian_blur(hm.copy(), kernel=11)
    got = gaussian_blur(
        np.transpose(hm, (0, 2, 3, 1)), kernel=11, border="constant",
        preserve_max=True,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("post_process", [None, "default", "unbiased"])
def test_keypoints_from_heatmaps_parity(ref, rng, post_process):
    hm, _ = _fake_heatmaps(rng)
    center, scale = _cs(rng, hm.shape[0])
    want_hm_preds, want_preds, want_vals = ref.keypoints_from_heatmaps(
        hm.copy(), center.copy(), scale.copy(), post_process=post_process,
        kernel=11,
    )
    got_hm_preds, got_preds, got_vals = D.keypoints_from_heatmaps(
        np.transpose(hm, (0, 2, 3, 1)), center, scale,
        post_process=post_process, kernel=11,
    )
    np.testing.assert_allclose(np.asarray(got_vals), want_vals, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_hm_preds), want_hm_preds, rtol=1e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_preds), want_preds, rtol=1e-3, atol=5e-2
    )


def test_keypoints_from_heatmaps_udp_parity(ref, rng):
    hm, _ = _fake_heatmaps(rng)
    center, scale = _cs(rng, hm.shape[0])
    want_hm_preds, want_preds, want_vals = ref.keypoints_from_heatmaps(
        hm.copy(), center.copy(), scale.copy(), use_udp=True, kernel=3,
        target_type="GaussianHeatmap",
    )
    got_hm_preds, got_preds, got_vals = D.keypoints_from_heatmaps(
        np.transpose(hm, (0, 2, 3, 1)), center, scale, use_udp=True, kernel=3
    )
    np.testing.assert_allclose(np.asarray(got_vals), want_vals, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_hm_preds), want_hm_preds, rtol=1e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_preds), want_preds, rtol=1e-3, atol=5e-2
    )


def test_simdr_decode_parity(ref, rng):
    B, K, k = 3, 21, 2
    Wv, Hv = 224 * k, 224 * k
    xv = rng.uniform(0, 1, size=(B, K, Wv)).astype(np.float32)
    yv = rng.uniform(0, 1, size=(B, K, Hv)).astype(np.float32)
    center, scale = _cs(rng, B)
    want = ref.keypoints_from_simdr(xv, yv, center.copy(), scale.copy(), k=k)
    got = np.asarray(D.keypoints_from_simdr(xv, yv, center, scale, split_ratio=k))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_metric_functions_match_reference(rng, ref):
    """keypoint_pck_accuracy / keypoint_auc / keypoint_epe vs the
    reference's top_down_eval implementations on randomized inputs with
    invisible joints and degenerate normalizers."""
    from litehandnet_tpu.eval.metrics import (
        keypoint_auc, keypoint_epe, keypoint_pck_accuracy,
    )

    N, K = 16, 21
    pred = rng.uniform(0, 64, (N, K, 2)).astype(np.float32)
    gt = pred + rng.normal(0, 3, (N, K, 2)).astype(np.float32)
    mask = rng.uniform(size=(N, K)) > 0.2
    mask[3] = False                       # a fully-masked sample
    norm = rng.uniform(20, 60, (N, 2)).astype(np.float32)
    norm[5] = 0.0                         # degenerate normalizer sample

    # the reference's _calc_distances MUTATES `normalize` in place
    # (top_down_eval.py:37, zeros -> 1e6); ours copies — pass each side
    # its own copy so the shared array isn't corrupted between calls
    acc_w, avg_w, cnt_w = ref.keypoint_pck_accuracy(
        pred, gt, mask, 0.2, norm.copy())
    acc_g, avg_g, cnt_g = keypoint_pck_accuracy(
        pred, gt, mask, 0.2, norm.copy())
    np.testing.assert_allclose(acc_g, acc_w, rtol=1e-6)
    np.testing.assert_allclose(avg_g, avg_w, rtol=1e-6)
    assert cnt_g == cnt_w

    np.testing.assert_allclose(
        keypoint_auc(pred, gt, mask, 30),
        ref.keypoint_auc(pred, gt, mask, 30), rtol=1e-6,
    )
    np.testing.assert_allclose(
        keypoint_epe(pred, gt, mask),
        ref.keypoint_epe(pred, gt, mask), rtol=1e-6,
    )
