"""Model zoo: forward shapes + parameter-count parity with the reference's
published numbers (BASELINE.md §B, from test_models_performance.ipynb)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.models import get_model


def _cfg(name, **model_kw):
    return config_from_dict(
        dict(
            MODEL=dict(name=name, **model_kw),
            DATASET=dict(num_joints=21, image_size=[64, 64], heatmap_size=[16, 16]),
            PIPELINE=dict(simdr_split_ratio=0),
        )
    )


def _n_params(model, x):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return sum(p.size for p in jax.tree.leaves(variables["params"])), variables


slow = pytest.mark.slow

# (name, model_kw, input_hw, expected_heatmap_hw, ref_params_M); families
# already covered by torch-weight-transfer FORWARD parity
# (test_forward_parity) keep only a cheap default smoke here
CASES = [
    ("resnet", dict(depth=18, output_channel=21), 64, 16, 15.38),
    pytest.param("resnet", dict(depth=50, output_channel=21), 64, 16, 30.62,
                 marks=slow),
    pytest.param("mobilenetv2", dict(output_channel=21), 64, 16, 9.59,
                 marks=slow),
    pytest.param("litehrnet", dict(depth=18, output_channel=21), 64, 16,
                 1.48, marks=slow),
    pytest.param("litehrnet", dict(depth=30, output_channel=21), 64, 16,
                 1.77, marks=slow),
    pytest.param("hourglass", dict(num_stack=1, input_channel=256,
                 output_channel=21), 64, 16, 3.43, marks=slow),
    pytest.param("hourglass", dict(num_stack=2, input_channel=256,
                 output_channel=21), 64, 16, 6.57, marks=slow),
    pytest.param("mynet", dict(num_stage=4, input_channel=128,
                 num_block=[2, 2, 2], output_channel=21), 64, 16, 2.24,
                 marks=slow),
    pytest.param("hourglass_ablation", dict(num_stage=4, input_channel=128,
                 num_block=[2, 2, 2], msrb=True, rca=False, ca_type="ca",
                 output_channel=21), 64, 16, None, marks=slow),
    ("srhandnet", dict(output_channel=24, pred_bbox=True), 64, None, 18.26),
]


@pytest.mark.parametrize(
    "name,model_kw,in_hw,out_hw,ref_m",
    CASES,
)
def test_forward_and_params(name, model_kw, in_hw, out_hw, ref_m):
    cfg = _cfg(name, **model_kw)
    model = get_model(cfg)
    x = jnp.zeros((1, in_hw, in_hw, 3))
    n, variables = _n_params(model, x)
    out = model.apply(
        variables, x, train=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    if name == "srhandnet":
        # scales: /16, /16, /8, /4 (reference SRhandNet.py:126-137)
        assert len(out) == 4
        assert out[0].shape == (1, in_hw // 16, in_hw // 16, 24)
        assert out[3].shape == (1, in_hw // 4, in_hw // 4, 24)
    elif name == "hourglass":
        ns = model_kw["num_stack"]
        assert out.shape == (1, ns, in_hw // 4, in_hw // 4, 21)
    else:
        assert out.shape == (1, out_hw, out_hw, 21), out.shape
    assert np.isfinite(np.asarray(jax.tree.leaves(out)[0])).all()
    if ref_m is not None:
        assert abs(n / 1e6 - ref_m) / ref_m < 0.06, (
            f"{name}: {n / 1e6:.3f}M vs reference {ref_m}M"
        )


@pytest.mark.slow
def test_mynet_stacked_simdr_region():
    cfg = config_from_dict(
        dict(
            MODEL=dict(
                name="mynet_stacked", hm_loss_factor=[1.0, 1.0],
                main_channels=128, hg_depth=4, increase=0,
                with_region_map=True, simdr_split_ratio=2,
            ),
            DATASET=dict(num_joints=21, image_size=[64, 64], heatmap_size=[16, 16]),
            PIPELINE=dict(simdr_split_ratio=2),
        )
    )
    model = get_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    n, variables = _n_params(model, x)
    hm_preds, pred_x, pred_y = model.apply(
        variables, x, train=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert len(hm_preds) == 2
    assert hm_preds[0].shape == (1, 16, 16, 24)  # 21 + 3 region channels
    assert pred_x.shape == (1, 21, 128)
    assert pred_y.shape == (1, 21, 128)


@pytest.mark.slow
def test_atthandnet_coords():
    # needs 224 input: 7 blur-pool halvings must leave >=2 px (as reference)
    cfg = _cfg("atthandnet", output_channel=42)
    model = get_model(cfg)
    x = jnp.zeros((1, 224, 224, 3))
    n, variables = _n_params(model, x)
    out = model.apply(
        variables, x, train=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out.shape == (1, 21, 2)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_model(_cfg("nonexistent"))


@pytest.mark.slow
def test_litehandnet_msrb():
    cfg = _cfg(
        "litehandnet_msrb", num_stage=3, input_channel=32, msrb_ca="ca",
        rbu_ca="ca", output_channel=21,
    )
    model = get_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    n, variables = _n_params(model, x)
    out = model.apply(
        variables, x, train=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out.shape == (1, 16, 16, 21)


def test_yolov6_detector():
    cfg = _cfg("yolov6", num_classes=1, width_multiple=0.25)
    model = get_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    n, variables = _n_params(model, x)
    out = model.apply(variables, x, train=False)
    # strides 8/16/32 -> 64 + 16 + 4 anchors
    assert out.shape == (1, 84, 6)


@pytest.mark.slow
def test_classifier():
    cfg = _cfg("classifier", num_classes=10)
    model = get_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    n, variables = _n_params(model, x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 10)


def test_torch_batchnorm_convention():
    """TorchBatchNorm must reproduce torch.nn.BatchNorm2d EXACTLY after a
    train step: normalization uses the biased batch variance, the running
    var EMAs the UNBIASED one (x n/(n-1)) — the one place flax.nn.BatchNorm
    deviates from torch (it EMAs the biased variance)."""
    torch = pytest.importorskip("torch")

    from litehandnet_tpu.models.layers import TorchBatchNorm

    rng = np.random.RandomState(0)
    B, H, W, C = 4, 5, 6, 7
    x = rng.uniform(-2, 2, (B, H, W, C)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    tbn.train()
    t_out = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    bn = TorchBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    f_out, mutated = bn.apply(
        variables, jnp.asarray(x), mutable=["batch_stats"]
    )

    np.testing.assert_allclose(
        np.asarray(f_out).transpose(0, 3, 1, 2), t_out.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )
    # running stats bit-for-bit convention parity (torch tracks the
    # unbiased variance; n = B*H*W per channel)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-6, atol=1e-7,
    )

    # eval mode consumes the stored stats identically
    tbn.eval()
    t_eval = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    bn_eval = TorchBatchNorm(use_running_average=True)
    f_eval = bn_eval.apply(
        {"params": variables["params"],
         "batch_stats": mutated["batch_stats"]}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(f_eval).transpose(0, 3, 1, 2), t_eval.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )

    # rank-2 input (torch BatchNorm1d analogue, used by BAM's channel gate)
    x2 = rng.uniform(-2, 2, (8, C)).astype(np.float32)
    tbn1 = torch.nn.BatchNorm1d(C, eps=1e-5, momentum=0.1)
    tbn1.train()
    t1 = tbn1(torch.from_numpy(x2))
    v2 = bn.init(jax.random.PRNGKey(0), jnp.asarray(x2))
    f1, mut2 = bn.apply(v2, jnp.asarray(x2), mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(f1), t1.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mut2["batch_stats"]["var"]), tbn1.running_var.numpy(),
        rtol=1e-6, atol=1e-7,
    )
