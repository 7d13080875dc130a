"""Parity tests for affine math vs the reference numpy/cv2 implementation."""

import numpy as np
import pytest

from litehandnet_tpu.ops import affine as A

from tests import ref_loader

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref():
    return ref_loader.load_post_transforms()


def _rand_cs(rng, n=8):
    center = rng.uniform(50, 400, size=(n, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 2.5, size=(n, 2)).astype(np.float32)
    return center, scale


def test_get_affine_transform_matches_cv2(ref, rng):
    center, scale = _rand_cs(rng)
    rots = rng.uniform(-60, 60, size=center.shape[0]).astype(np.float32)
    out_size = (224, 224)
    for inv in (False, True):
        for c, s, r in zip(center, scale, rots):
            want = ref.get_affine_transform(c, s, float(r), np.array(out_size), inv=inv)
            got = np.asarray(A.get_affine_transform(c, s, r, out_size, inv=inv))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_get_affine_transform_batched(ref, rng):
    center, scale = _rand_cs(rng, n=5)
    rots = rng.uniform(-30, 30, size=5).astype(np.float32)
    got = np.asarray(A.get_affine_transform(center, scale, rots, (256, 192)))
    assert got.shape == (5, 2, 3)
    for i in range(5):
        want = ref.get_affine_transform(
            center[i], scale[i], float(rots[i]), np.array([256, 192])
        )
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)


def test_get_warp_matrix_udp(ref, rng):
    for _ in range(5):
        theta = float(rng.uniform(-45, 45))
        size_input = rng.uniform(100, 500, size=2).astype(np.float32)
        size_target = rng.uniform(100, 500, size=2).astype(np.float32)
        size_dst = (192, 256)
        want = ref.get_warp_matrix(theta, size_input, np.array(size_dst, np.float32), size_target)
        got = np.asarray(A.get_warp_matrix(theta, size_input, size_dst, size_target))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_warp_affine_joints(ref, rng):
    mat = ref.get_affine_transform(
        np.array([120.0, 130.0]), np.array([1.2, 1.2]), 15.0, np.array([224, 224])
    )
    joints = rng.uniform(0, 250, size=(21, 2)).astype(np.float32)
    want = ref.warp_affine_joints(joints, mat)
    got = np.asarray(A.affine_transform_points(joints, mat.astype(np.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_transform_preds(ref, rng):
    center, scale = _rand_cs(rng, n=4)
    coords = rng.uniform(0, 56, size=(4, 21, 2)).astype(np.float32)
    for use_udp in (False, True):
        got = np.asarray(
            A.transform_preds(coords, center, scale, (56, 56), use_udp=use_udp)
        )
        for i in range(4):
            want = ref.transform_preds(
                coords[i].copy(), center[i], scale[i].copy(), [56, 56], use_udp=use_udp
            )
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)


def test_invert_affine_roundtrip(rng):
    center, scale = _rand_cs(rng, n=3)
    mat = A.get_affine_transform(center, scale, np.float32([10, -20, 0]), (224, 224))
    inv = A.invert_affine(mat)
    pts = rng.uniform(0, 224, size=(3, 10, 2)).astype(np.float32)
    back = A.affine_transform_points(A.affine_transform_points(pts, inv), mat)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-3, atol=1e-2)
