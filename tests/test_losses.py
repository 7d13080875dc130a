"""Loss parity tests vs the reference torch implementations (CPU torch)."""

import numpy as np
import pytest

from litehandnet_tpu.losses import losses as L

from tests import ref_loader

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref_hm():
    return ref_loader._load("loss/heatmapLoss.py", "_ref_heatmap_loss")


@pytest.fixture(scope="module")
def ref_simdr():
    return ref_loader._load("loss/centernet_simdr_loss.py", "_ref_simdr_loss")


def _fake(rng, B=4, K=21, H=32, W=32):
    out = rng.uniform(0, 1, size=(B, K, H, W)).astype(np.float32)
    tgt = np.zeros((B, K, H, W), np.float32)
    # a few gaussian-ish positives
    tgt[:, :, 10:14, 10:14] = rng.uniform(0.4, 1.0, size=(B, K, 4, 4))
    w = (rng.uniform(size=(B, K, 1)) > 0.2).astype(np.float32)
    return out, tgt, w


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("loss_type", ["L2", "L1", "SmoothL1"])
@pytest.mark.parametrize("balance", [True, False])
def test_distance_loss_parity(ref_hm, rng, loss_type, balance):
    out, tgt, w = _fake(rng)
    ref = ref_hm.DistanceLoss(loss_type=loss_type, reduction="mean", balance=balance)
    want = ref(
        torch.from_numpy(out), torch.from_numpy(tgt), torch.from_numpy(w)
    ).item()
    got = float(
        L.distance_loss(
            _nhwc(out), _nhwc(tgt), w[..., 0], loss_type=loss_type,
            balance=balance,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_joints_distance_loss_parity(ref_hm, rng):
    out, tgt, w = _fake(rng)
    ref = ref_hm.JointsDistanceLoss(use_target_weight=True)
    want = ref(
        torch.from_numpy(out), torch.from_numpy(tgt), torch.from_numpy(w)
    ).item()
    got = float(L.joints_distance_loss(_nhwc(out), _nhwc(tgt), w[..., 0]))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kl_focal_loss_parity(ref_hm, rng):
    out, tgt, w = _fake(rng)
    ref = ref_hm.KLFocalLoss()
    want = ref(
        torch.from_numpy(out), torch.from_numpy(tgt), torch.from_numpy(w)
    ).item()
    got = float(L.kl_focal_loss(_nhwc(out), _nhwc(tgt), w[..., 0]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_focal_loss_parity(ref_hm, rng):
    out, tgt, w = _fake(rng, B=2, K=4, H=16, W=16)
    ref = ref_hm.FocalLoss()
    want = ref(
        torch.from_numpy(out), torch.from_numpy(tgt), torch.from_numpy(w)
    ).item()
    got = float(L.focal_loss(_nhwc(out), _nhwc(tgt), w[..., 0]))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_mask_loss_parity(ref_hm, rng):
    out, tgt, _ = _fake(rng, B=2, K=3)
    ref = ref_hm.MaskLoss()
    want = ref(torch.from_numpy(out), torch.from_numpy(tgt)).item()
    got = float(L.mask_loss(_nhwc(out), _nhwc(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_region_loss_parity(ref_hm, rng):
    B, H, W = 3, 16, 16
    out = rng.uniform(0.01, 0.99, size=(B, 2, H, W)).astype(np.float32)
    tgt = np.zeros((B, 2, H, W), np.float32)
    tgt[:, 0, 5:10, 5:10] = 0.4
    tgt[:, 1, 5:10, 5:10] = 0.6
    ref = ref_hm.RegionLoss()
    want = ref(torch.from_numpy(out), torch.from_numpy(tgt)).item()
    got = float(L.region_loss(_nhwc(out), _nhwc(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_kl_discret_loss_parity(ref_simdr, rng):
    B, K, Wv, Hv = 3, 21, 448, 448
    px = rng.normal(size=(B, K, Wv)).astype(np.float32)
    py = rng.normal(size=(B, K, Hv)).astype(np.float32)
    tx = rng.uniform(0, 1, size=(B, K, Wv)).astype(np.float32)
    ty = rng.uniform(0, 1, size=(B, K, Hv)).astype(np.float32)
    w = (rng.uniform(size=(B, K, 1)) > 0.3).astype(np.float32)
    ref = ref_simdr.KLDiscretLoss()
    want = ref(
        torch.from_numpy(px), torch.from_numpy(py), torch.from_numpy(tx),
        torch.from_numpy(ty), torch.from_numpy(w),
    ).item()
    got = float(L.kl_discret_loss(px, py, tx, ty, w[..., 0]))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_centernet_losses_parity(ref_simdr, rng):
    B, H, W = 2, 32, 32
    pred = rng.uniform(0.01, 0.99, size=(B, 1, H, W)).astype(np.float32)
    tgt = np.zeros((B, 1, H, W), np.float32)
    tgt[:, :, 8, 8] = 1.0
    tgt[:, :, 20, 12] = 0.7
    want = ref_simdr.focal_loss(torch.from_numpy(pred), torch.from_numpy(tgt)).item()
    got = float(L.centernet_focal_loss(_nhwc(pred), _nhwc(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-3)

    p4 = rng.uniform(size=(B, 4, H, W)).astype(np.float32)
    t4 = rng.uniform(size=(B, 4, H, W)).astype(np.float32)
    mask = (tgt == 1.0).astype(np.float32)
    want = ref_simdr.reg_l1_loss(
        torch.from_numpy(p4), torch.from_numpy(t4), torch.from_numpy(mask)
    ).item()
    got = float(L.reg_l1_loss(_nhwc(p4), _nhwc(t4), _nhwc(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_topdown_heatmap_loss_module(rng):
    """End-to-end criterion module with SimDR decoders."""
    import jax
    from litehandnet_tpu.config import config_from_dict

    cfg = config_from_dict(
        dict(
            MODEL=dict(name="litehandnet"),
            DATASET=dict(num_joints=21, image_size=[64, 64], heatmap_size=[16, 16]),
            PIPELINE=dict(simdr_split_ratio=2),
            LOSS=dict(type="TopdownHeatmapLoss", loss_weight=[1.0, 0.1], auto_weight=False),
        )
    )
    from litehandnet_tpu.losses import get_loss

    crit = get_loss(cfg)
    out = rng.uniform(0, 1, size=(2, 16, 16, 21)).astype(np.float32)
    batch = {
        "target": rng.uniform(0, 1, size=(2, 16, 16, 21)).astype(np.float32),
        "target_weight": np.ones((2, 21), np.float32),
        "simdr_x": rng.uniform(0, 1, size=(2, 21, 128)).astype(np.float32),
        "simdr_y": rng.uniform(0, 1, size=(2, 21, 128)).astype(np.float32),
    }
    variables = crit.init(jax.random.PRNGKey(0), out, batch)
    (loss, loss_dict) = crit.apply(variables, out, batch)
    assert np.isfinite(float(loss))
    assert set(loss_dict) == {"heatmap", "simdr"}


def test_distance_loss_stacked_output_single_target(rng):
    """A stacked [B, S, H, W, K] output against a single-sigma [B, H, W, K]
    target must supervise EVERY stack with that target (regression: the
    implicit right-aligned broadcast paired the target's batch dim with the
    output's stack dim — an error for B != S, silently wrong at B == S)."""
    B, S, Hh, Ww, Kk = 4, 2, 8, 8, 3
    out = rng.uniform(0, 1, size=(B, S, Hh, Ww, Kk)).astype(np.float32)
    tgt = rng.uniform(0, 1, size=(B, Hh, Ww, Kk)).astype(np.float32)
    w = np.ones((B, Kk), np.float32)

    # balance=True is the production default: the pos/neg counts must also
    # see the expanded target, or pos_factor inflates ~S x vs the
    # equivalent list-sigma (stacked-target) config
    for balance in (False, True):
        got = float(L.distance_loss(out, tgt, w, balance=balance))
        want = float(L.distance_loss(
            out, np.repeat(tgt[:, None], S, axis=1), w, balance=balance
        ))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    # B == S is the dangerous silent case: make sure it matches too
    out_sq = rng.uniform(0, 1, size=(S, S, Hh, Ww, Kk)).astype(np.float32)
    tgt_sq = rng.uniform(0, 1, size=(S, Hh, Ww, Kk)).astype(np.float32)
    w_sq = np.ones((S, Kk), np.float32)
    for balance in (False, True):
        got = float(L.distance_loss(out_sq, tgt_sq, w_sq, balance=balance))
        want = float(L.distance_loss(
            out_sq, np.repeat(tgt_sq[:, None], S, axis=1), w_sq,
            balance=balance,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-6)
