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

# (reference config path, family registry name, input size)
CASES = [
    ("config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py",
     "litehandnet", 64),
    ("config/litehandnet/freihand/_1_freihand_224x244_dark_h4_ca_r4_leaky.py",
     "litehandnet", 64),
    ("config/resnet/_2_freihand2d_224x224_dark_resnet18.py", "resnet", 64),
    ("config/resnet/_1_freihand2d_224x224_dark_resnet50.py", "resnet", 64),
    ("config/mobilenetv2/_1_freihand2d_224x224_dark.py", "mobilenetv2", 64),
    ("config/srhandnet/_1_freihand2d_224x224_region.py", "srhandnet", 64),
    ("config/litehrnet/_2_freihand_224x244_dark_18.py", "litehrnet", 64),
    ("config/litehrnet/_1_freihand_224x244_dark_simdr_30.py", "litehrnet", 64),
    ("config/hourglass/_2_freihand2d_224x224_dark_h2.py", "hourglass", 64),
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


@pytest.mark.parametrize("refcfg_path,family,size", CASES,
                         ids=[c[0].split("/")[-1] for c in CASES])
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
