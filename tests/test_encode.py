"""Parity tests: target encoders vs the reference numpy implementation.

Our encoders emit channels-last [H, W, K]; the reference emits [K, H, W] —
tests transpose before comparing.
"""

import numpy as np
import pytest

from litehandnet_tpu.ops import encode as E

from tests import ref_loader

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference checkout absent"
)

IMAGE_SIZE = np.array([224, 224])
HEATMAP_SIZE = np.array([56, 56])


@pytest.fixture(scope="module")
def ref_gt():
    mod = ref_loader.load_generate_target()
    return mod


def _ann_cfg(num_joints=21):
    return {
        "num_joints": num_joints,
        "image_size": IMAGE_SIZE,
        "heatmap_size": HEATMAP_SIZE,
        "joint_weights": np.ones((num_joints, 1), np.float32),
        "use_different_joint_weights": False,
    }


def _rand_joints(rng, n=21, lo=-30, hi=250):
    joints = np.zeros((n, 3), np.float32)
    joints[:, :2] = rng.uniform(lo, hi, size=(n, 2))
    vis = np.zeros((n, 3), np.float32)
    vis[:, 0] = (rng.uniform(size=n) > 0.2).astype(np.float32)
    vis[:, 1] = vis[:, 0]
    return joints, vis


@pytest.mark.parametrize("unbiased", [False, True])
def test_msra_heatmap_parity(ref_gt, rng, unbiased):
    gen = ref_gt.TopDownGenerateTarget(sigma=2, unbiased_encoding=unbiased)
    for _ in range(5):
        joints, vis = _rand_joints(rng)
        want_t, want_w = gen._msra_generate_target(_ann_cfg(), joints, vis, 2)
        got_t, got_w = E.msra_heatmaps(
            joints[:, :2], vis[:, 0], IMAGE_SIZE, HEATMAP_SIZE, sigma=2.0,
            unbiased=unbiased,
        )
        got_t = np.transpose(np.asarray(got_t), (2, 0, 1))
        np.testing.assert_allclose(np.asarray(got_w), want_w[:, 0], atol=1e-6)
        np.testing.assert_allclose(got_t, want_t, rtol=1e-5, atol=1e-5)


def test_udp_heatmap_parity(ref_gt, rng):
    gen = ref_gt.TopDownGenerateTarget(sigma=2, encoding="UDP")
    for _ in range(5):
        joints, vis = _rand_joints(rng)
        want_t, want_w = gen._udp_generate_target(_ann_cfg(), joints, vis, 2)
        got_t, got_w = E.udp_heatmaps(
            joints[:, :2], vis[:, 0], IMAGE_SIZE, HEATMAP_SIZE, sigma=2.0
        )
        got_t = np.transpose(np.asarray(got_t), (2, 0, 1))
        np.testing.assert_allclose(np.asarray(got_w), want_w[:, 0], atol=1e-6)
        np.testing.assert_allclose(got_t, want_t, rtol=1e-5, atol=1e-5)


def test_simdr_parity(rng):
    mod = ref_loader.load_generate_simdr()
    gen = mod.GenerateSimDR(sigma=2, k=2)
    joints, vis = _rand_joints(rng, lo=0, hi=220)
    want_x, want_y = gen._generate_sa_simdr(joints, vis[:, :1], IMAGE_SIZE)
    got_x, got_y = E.simdr_targets(
        joints[:, :2], vis[:, 0], IMAGE_SIZE, split_ratio=2, sigma=2.0
    )
    np.testing.assert_allclose(np.asarray(got_x), want_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=1e-5, atol=1e-5)


def test_region_map_parity(ref_gt, rng):
    gen = ref_gt.SRHandNetGenerateTarget(pred_bbox=True)
    for _ in range(4):
        bbox = np.array(
            [
                rng.uniform(0, 100),
                rng.uniform(0, 100),
                rng.uniform(30, 150),
                rng.uniform(30, 150),
            ],
            np.float32,
        )
        cfg = _ann_cfg(num_joints=1)
        want, _ = gen._region_generate_target(bbox, cfg, 2)
        got = np.transpose(
            np.asarray(E.region_map(bbox, IMAGE_SIZE, HEATMAP_SIZE, sigma=2.0)),
            (2, 0, 1),
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_encode_decode_roundtrip(rng):
    """GT-roundtrip (encode -> decode must recover keypoints within 0.5 hm px;
    the reference's commented-out sanity hook, test.py:122)."""
    from litehandnet_tpu.ops import decode as D

    joints, vis = _rand_joints(rng, lo=20, hi=200)
    vis[:, :] = 1.0
    target, _ = E.msra_heatmaps(
        joints[:, :2], vis[:, 0], IMAGE_SIZE, HEATMAP_SIZE, sigma=2.0,
        unbiased=True,
    )
    hm = np.asarray(target)[None]  # [1, H, W, K]
    preds, maxvals = D.argmax_coords(hm)
    preds = D.refine_dark(hm, preds, kernel=11)
    stride = IMAGE_SIZE[0] / HEATMAP_SIZE[0]
    err = np.abs(np.asarray(preds)[0] - joints[:, :2] / stride)
    assert err.max() < 0.5, err.max()
