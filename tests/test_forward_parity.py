"""Torch-weight-transfer forward parity for every model family.

For each family: build the reference torch model from a REFERENCE config
(loaded live via its own config loader), re-init sanely (the reference's
normal_init(std=1) explodes deep nets to NaN), convert the state_dict to the
Flax variables tree via litehandnet_tpu.utils.torch_import, and assert both
forward passes agree in eval mode — converting round-1's "param counts match"
into "same function". Reference surface: models/__init__.py:20-26.

Inputs are 64x64 (conv params are spatial-agnostic; keeps CPU compile cheap)
except atthandnet, whose architecture hard-codes 224x224.
"""

import numpy as np
import pytest

from tests import ref_loader

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference checkout absent"
)

slow = pytest.mark.slow

# (reference config path, family registry name, input size); one cheap case
# per family runs by default, broader variants are `slow`
CASES = [
    ("config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py",
     "litehandnet", 64),
    pytest.param(
        "config/litehandnet/freihand/_1_freihand_224x244_dark_h4_ca_r4_leaky.py",
        "litehandnet", 64, marks=slow),
    pytest.param("config/resnet/_2_freihand2d_224x224_dark_resnet18.py",
                 "resnet", 64, marks=slow),
    pytest.param("config/resnet/_1_freihand2d_224x224_dark_resnet50.py",
                 "resnet", 64, marks=slow),
    pytest.param("config/mobilenetv2/_1_freihand2d_224x224_dark.py",
                 "mobilenetv2", 64, marks=slow),
    ("config/srhandnet/_1_freihand2d_224x224_region.py", "srhandnet", 64),
    pytest.param("config/litehrnet/_2_freihand_224x244_dark_18.py",
                 "litehrnet", 64, marks=slow),
    pytest.param("config/litehrnet/_1_freihand_224x244_dark_simdr_30.py",
                 "litehrnet", 64, marks=slow),
    pytest.param("config/hourglass/_2_freihand2d_224x224_dark_h2.py",
                 "hourglass", 64, marks=slow),
    pytest.param("config/mynet/_2_freihand2d_224x224_dark.py", "mynet", 64,
                 marks=slow),
    pytest.param("config/atthandnet/_1_freihand2d_224x224.py",
                 "atthandnet", 224, marks=slow),
] + [
    pytest.param(f"config/hourglass_ablation/freihand/{name}.py",
                 "hourglass_ablation", 64, marks=slow)
    for name in (
        "_1_freihand2d_224x224_dark_no_msrb",
        "_2_freihand2d_224x224_dark_se",
        "_3_freihand2d_224x224_dark_1x1",
        "_4_freihand2d_224x224_dark_identity",
        "_5_freihand2d_224x224_dark_CBAM",
        "_6_freihand2d_224x224_dark_ca_all",
    )
]


def sane_reinit(tm, seed=0):
    """Replace the reference's exploding std=1 init with xavier + randomized
    BN stats so eval outputs are finite and numerically comparable."""
    import torch.nn as tnn

    torch.manual_seed(seed)
    for mod in tm.modules():
        if isinstance(mod, (tnn.Conv2d, tnn.ConvTranspose2d, tnn.Linear)):
            tnn.init.xavier_normal_(mod.weight)
            if mod.bias is not None:
                tnn.init.normal_(mod.bias, 0, 0.1)
        elif isinstance(mod, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            tnn.init.normal_(mod.weight, 1.0, 0.1)
            tnn.init.normal_(mod.bias, 0, 0.1)
            mod.running_mean.normal_(0, 0.1)
            mod.running_var.uniform_(0.5, 1.5)


def to_nhwc(a):
    a = a.numpy() if hasattr(a, "numpy") else np.asarray(a)
    if a.ndim == 4:
        return a.transpose(0, 2, 3, 1)
    if a.ndim == 5:  # stacked hourglass [B, S, K, H, W]
        return a.transpose(0, 1, 3, 4, 2)
    return a


def run_pair(refcfg_path, family, size, batch=2):
    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.utils.torch_import import import_torch_state_dict

    refcfg = ref_loader.load_ref_config(refcfg_path)
    tm = ref_loader.build_ref_model(refcfg)
    sane_reinit(tm)

    cfg = config_from_dict(dict(refcfg))
    model = get_model(cfg)
    target = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    var = import_torch_state_dict(family, tm.state_dict(), target)

    x = np.random.RandomState(0).uniform(
        -1, 1, (batch, size, size, 3)
    ).astype(np.float32)
    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    fy = model.apply(var, jnp.asarray(x), train=False)
    return model, var, cfg, ty, fy, x


def assert_close(fy, ty, rtol=1e-4):
    f = np.asarray(fy)
    t = to_nhwc(ty)
    assert f.shape == t.shape, (f.shape, t.shape)
    scale = np.abs(t).max() + 1e-9
    np.testing.assert_allclose(f / scale, t / scale, atol=rtol, rtol=0)


@pytest.mark.parametrize("refcfg_path,family,size", CASES)
def test_forward_parity(refcfg_path, family, size):
    _, _, _, ty, fy, _ = run_pair(refcfg_path, family, size)
    if isinstance(fy, (tuple, list)):
        assert len(fy) == len(ty)
        for f, t in zip(fy, ty):
            assert_close(f, t)
    else:
        assert_close(fy, ty)


def test_forward_parity_litehandnet_deploy():
    """The deploy-fused graph must ALSO match the reference torch model —
    reparam fusion composed with weight transfer (reference test.py:106-107)."""
    import jax.numpy as jnp

    from litehandnet_tpu.models import fuse_params, get_model

    model, var, cfg, ty, _, x = run_pair(CASES[0][0], "litehandnet", 64)
    deploy_model = get_model(cfg, deploy=True)
    deploy_var = fuse_params(var)
    fy = deploy_model.apply(deploy_var, jnp.asarray(x), train=False)
    # fusion itself is float32-exact only to ~1e-3 relative through 50 layers
    f = np.asarray(fy)
    t = to_nhwc(ty)
    scale = np.abs(t).max() + 1e-9
    np.testing.assert_allclose(f / scale, t / scale, atol=5e-3, rtol=0)


@pytest.mark.slow
def test_forward_parity_mynet_stacked():
    """Gen-1 STACKED mynet (models/pose_estimation/pose_hg_ms_att.py:189-265).
    The reference class is unrunnable as shipped — __init__ calls an
    undefined self.check_init — so the harness patches that out and verifies
    against the function the code then computes (incl. SimDR heads)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.models.ms_att_hourglass_stacked import (
        MSAttHourglassStacked,
    )
    from litehandnet_tpu.utils.torch_import import import_torch_state_dict

    ref_loader.ensure_reference_importable()
    gen1 = importlib.import_module("models.pose_estimation.pose_hg_ms_att")
    gen1.MultiScaleAttentionHourglass.check_init = lambda self, cfg: None
    cfg1 = dict(hm_loss_factor=[1.0, 1.0], main_channels=128, increase=0,
                n_joints=21, with_region_map=True, hg_depth=4,
                simdr_split_ratio=2, image_size=(64, 64))
    tm = gen1.MultiScaleAttentionHourglass(cfg1)
    tm.eval()
    sane_reinit(tm)

    cfg = config_from_dict(dict(
        MODEL=dict(name="mynet_stacked", hm_loss_factor=[1.0, 1.0],
                   main_channels=128, increase=0, with_region_map=True,
                   hg_depth=4, simdr_split_ratio=2),
        DATASET=dict(num_joints=21, image_size=[64, 64],
                     heatmap_size=[16, 16]),
    ))
    model = MSAttHourglassStacked.from_config(cfg)
    target = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    var = import_torch_state_dict("mynet_stacked", tm.state_dict(), target)
    x = np.random.RandomState(0).uniform(-1, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    fout = model.apply(var, jnp.asarray(x), train=False)

    def flatten(o):
        res = []

        def rec(v):
            if isinstance(v, (list, tuple)):
                for u in v:
                    rec(u)
            else:
                res.append(v)

        rec(o)
        return res

    tl, fl = flatten(tout), flatten(fout)
    assert len(tl) == len(fl)
    for t, f in zip(tl, fl):
        assert_close(f, t)


@pytest.mark.slow
def test_forward_parity_yolov6(monkeypatch):
    """YOLOv6 hand-OD branch (models/object_detection/yolov6/), yolov6n
    scaling (depth 0.33, width 0.25). The reference subtree is dead code
    with no configs, so the config namespace is constructed by hand
    (yolo.py:62-86 consumes it); the shipped ``Model.__init__`` is also
    unrunnable — ``self.init_weights(self)`` (yolo.py:31) passes self to a
    zero-arg method (TypeError) — so ``init_weights`` is patched out, which
    keeps torch-default BN eps/momentum (matching our BatchNorm; the
    method's eps=1e-3 re-binding is unreachable reference-side too).
    Covers the learnable ConvTranspose neck upsamplers (common.py:85-98)
    and the full eval-mode decode (effidehead.py:72-88)."""
    import importlib
    import types

    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.models.yolov6 import YOLOv6
    from litehandnet_tpu.utils.torch_import import import_torch_state_dict

    ref_loader.ensure_reference_importable()
    yolo = importlib.import_module("models.object_detection.yolov6.yolo")
    # patch via monkeypatch so the stub does not leak into later tests that
    # import the reference class (undone at teardown)
    monkeypatch.setattr(
        yolo.Model, "init_weights", lambda self, *a, **k: None
    )
    ns = types.SimpleNamespace
    refcfg = ns(model=ns(
        depth_multiple=0.33, width_multiple=0.25,
        backbone=ns(num_repeats=[1, 6, 12, 18, 6],
                    out_channels=[64, 128, 256, 512, 1024]),
        neck=ns(num_repeats=[12, 12, 12, 12],
                out_channels=[256, 128, 128, 256, 256, 512]),
        head=ns(num_layers=3, anchors=1, begin_indices=24,
                out_indices=[17, 20, 23]),
    ))
    tm = yolo.Model(refcfg, channels=3, num_classes=1, anchors=1)
    tm.eval()
    sane_reinit(tm)
    # keep the eval decode finite: exp(wh logits) overflows under xavier's
    # O(1) reg outputs (the decode expects trained near-zero logits)
    for conv in tm.detect.reg_preds:
        conv.weight.data.mul_(0.01)
        conv.bias.data.mul_(0.01)

    model = YOLOv6(num_classes=1, width=0.25, depth=0.33)
    target = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    var = import_torch_state_dict("yolov6", tm.state_dict(), target)
    x = np.random.RandomState(0).uniform(-1, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    fy = model.apply(var, jnp.asarray(x), train=False)
    assert_close(fy, ty)  # [B, 84, 6] decoded rows over strides 8/16/32

    # training-mode raw maps (effidehead.py:68-71; na=1 -> squeeze): pins
    # the pre-decode channel order reg4/obj/cls per scale
    tm.train()
    with torch.no_grad():
        t_raw = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        tm.eval()
    f_raw, _ = model.apply(
        var, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    assert len(f_raw) == len(t_raw) == 3
    for f, t in zip(f_raw, t_raw):
        # torch's permuted raw map is ALREADY [bs, ny, nx, no] — compare
        # directly (to_nhwc would mis-transpose a channel-last 4D tensor)
        t = t.squeeze(1).numpy()
        f = np.asarray(f)
        assert f.shape == t.shape, (f.shape, t.shape)
        scale = np.abs(t).max() + 1e-9
        # atol 2e-3: train-mode batch-stat BN noise reaches ~8e-4 at the
        # deepest (2x2) scale; a channel-order mistake would miss by O(1)
        np.testing.assert_allclose(f / scale, t / scale, atol=2e-3, rtol=0)


@pytest.mark.slow
def test_forward_parity_litehandnet_msrb():
    """MSRB variant (models/pose_estimation/liteHandNet/litehourglass.py:
    13-237; vendored in the reference but never wired into its registry)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.utils.torch_import import import_torch_state_dict
    from tests.ref_loader import _AddictStub

    ref_loader.ensure_reference_importable()
    mod = importlib.import_module(
        "models.pose_estimation.liteHandNet.litehourglass"
    )
    cfgd = dict(
        MODEL=dict(name="litehandnet_msrb", num_stage=4, msrb_ca="ca",
                   rbu_ca="ca", input_channel=64, output_channel=21),
        DATASET=dict(num_joints=21, image_size=[64, 64],
                     heatmap_size=[16, 16]),
    )
    tm = mod.LiteHandNet(_AddictStub(cfgd))
    tm.eval()
    sane_reinit(tm)
    cfg = config_from_dict(dict(cfgd))
    model = get_model(cfg)
    target = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    var = import_torch_state_dict("litehandnet_msrb", tm.state_dict(), target)
    x = np.random.RandomState(0).uniform(-1, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    fy = model.apply(var, jnp.asarray(x), train=False)
    assert_close(fy, ty)
