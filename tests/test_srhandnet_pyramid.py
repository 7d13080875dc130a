"""SRHandNet two-stage pyramid inference: geometry roundtrip with a stub
network whose region map encodes a KNOWN bbox and whose keypoint channels
carry KNOWN peaks — the decoded frame-space coords must match analytically
(reference loop: official_code.py:28-213)."""

import numpy as np
import pytest

from litehandnet_tpu.eval.srhandnet_pyramid import SRHandNetPyramid

pytestmark = pytest.mark.slow  # ~2 min of CPU compile for the vmapped NMS

K = 21
NET = 256
HM = 64          # NET/4, the finest SRHandNet output
FRAME_H, FRAME_W = 480, 640

# known hand: center (300, 200), size 160x120 in frame coords
CX, CY, RW, RH = 300.0, 200.0, 160.0, 120.0
RATIO_IN = min(NET / FRAME_H, NET / FRAME_W)        # 0.4
RATIO_DOWN = NET / HM                                # 4.0
PEAK_X = int(round(CX * RATIO_IN / RATIO_DOWN))      # 30
PEAK_Y = int(round(CY * RATIO_IN / RATIO_DOWN))      # 20
KPT_HM_X, KPT_HM_Y = 12, 10                          # stage-2 peak per joint


class StubModel:
    """Emits crafted 4-scale outputs; batch size disambiguates the stage."""

    def apply(self, variables, img, train=False):
        import jax.numpy as jnp

        B = img.shape[0]
        hm = np.zeros((B, HM, HM, K + 3), np.float32)
        if B == 1:  # stage 1: region map in the last 3 channels
            hm[0, PEAK_Y, PEAK_X, K] = 1.0
            hm[0, :, :, K + 1] = RW * RATIO_IN / NET   # width ratio (const)
            hm[0, :, :, K + 2] = RH * RATIO_IN / NET   # height ratio
        else:       # stage 2: every keypoint channel peaks at a known spot
            hm[0, KPT_HM_Y, KPT_HM_X, :K] = 1.0
        return (jnp.asarray(hm),) * 4


def test_pyramid_geometry_roundtrip():
    pyr = SRHandNetPyramid(
        StubModel(), {}, input_hw=(NET, NET), max_hands=4,
        det_thr=0.25, hand_thr=0.2, num_joints=K,
    )
    frame = np.zeros((FRAME_H, FRAME_W, 3), np.uint8)
    coords, found, rects, hand_valid = pyr(frame)

    assert hand_valid[0] and not hand_valid[1:].any()
    # detected rect must reproduce the encoded bbox
    left, top, w, h = rects[0]
    np.testing.assert_allclose(
        [left, top, w, h], [CX - RW / 2, CY - RH / 2, RW, RH], atol=1.0
    )
    # keypoints map back through crop ratio + offsets
    ratio_crop = min(NET / h, NET / w)
    scale = RATIO_DOWN / ratio_crop
    exp_x = KPT_HM_X * scale + left
    exp_y = KPT_HM_Y * scale + top
    assert found[0].all()
    np.testing.assert_allclose(coords[0, :, 0], exp_x, atol=1e-2)
    np.testing.assert_allclose(coords[0, :, 1], exp_y, atol=1e-2)


def test_pyramid_empty_frame():
    """No peaks above threshold -> no hands."""

    class EmptyStub(StubModel):
        def apply(self, variables, img, train=False):
            import jax.numpy as jnp

            return (jnp.zeros((img.shape[0], HM, HM, K + 3)),) * 4

    pyr = SRHandNetPyramid(EmptyStub(), {}, max_hands=4, num_joints=K)
    _, found, _, hand_valid = pyr(np.zeros((FRAME_H, FRAME_W, 3), np.uint8))
    assert not hand_valid.any()
    assert not found.any()
