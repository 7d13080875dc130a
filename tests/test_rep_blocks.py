"""Torch-weight-transfer forward parity for the rep_pose_hg_ms_att block
library (reference models/rep_pose_hg_ms_att.py:6-63 — dead code upstream,
rebuilt as litehandnet_tpu/models/rep_blocks.py).

The reference file calls an ``autopad`` helper it never defines, so the test
injects the standard YOLOv5 definition into the loaded module before
constructing anything — the same definition rep_blocks.autopad reproduces.
"""

import numpy as np
import pytest

from tests import ref_loader

torch = pytest.importorskip("torch")

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from litehandnet_tpu.models import rep_blocks  # noqa: E402

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref_mod():
    mod = ref_loader._load(
        "models/rep_pose_hg_ms_att.py", "ref_rep_pose_hg_ms_att")
    mod.autopad = rep_blocks.autopad  # undefined in the reference file
    return mod


def _randomize(tmodel, rng):
    """Non-trivial weights AND running stats so BN eval mode is exercised."""
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.from_numpy(
                rng.normal(0, 0.5, p.shape).astype(np.float32)))
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, m.running_mean.shape)
                    .astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 2.0, m.running_var.shape)
                    .astype(np.float32)))


def _convert(state_dict):
    """torch state_dict -> flax {'params', 'batch_stats'} for rep_blocks
    modules (conv.weight OIHW->HWIO; bn stats to the batch_stats tree)."""
    params, stats = {}, {}

    def put(tree, path, leaf):
        for k in path[:-1]:
            tree = tree.setdefault(k, {})
        tree[path[-1]] = leaf

    for key, val in state_dict.items():
        v = val.detach().numpy()
        parts = key.split(".")
        mod_path, leaf = parts[:-1], parts[-1]
        if mod_path and mod_path[-1] == "bn":
            if leaf == "weight":
                put(params, mod_path + ["scale"], jnp.asarray(v))
            elif leaf == "bias":
                put(params, mod_path + ["bias"], jnp.asarray(v))
            elif leaf == "running_mean":
                put(stats, mod_path + ["mean"], jnp.asarray(v))
            elif leaf == "running_var":
                put(stats, mod_path + ["var"], jnp.asarray(v))
            # num_batches_tracked: dropped
        elif leaf == "weight":
            put(params, mod_path + ["kernel"],
                jnp.asarray(v.transpose(2, 3, 1, 0)))
        elif leaf == "bias":
            put(params, mod_path + ["bias"], jnp.asarray(v))
    return {"params": params, "batch_stats": stats}


def _parity(tmodel, fmodule, x_nchw, atol=2e-5):
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x_nchw)).numpy()
    variables = _convert(tmodel.state_dict())
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    got = fmodule.apply(variables, x, train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)
    return variables, x, want


CASES = [
    ("conv", lambda M: M.Conv(8, 16, k=3, s=2),
     lambda: rep_blocks.ConvBnAct(16, 3, 2), 8),
    ("conv_1x1_noact", lambda M: M.Conv(8, 12, k=1, act=False),
     lambda: rep_blocks.ConvBnAct(12, 1, act=False), 8),
    ("dwconv", lambda M: M.DWConv(8, 16, k=3, s=1),
     lambda: rep_blocks.dw_conv(8, 16, k=3, s=1), 8),
    ("bottleneck", lambda M: M.Bottleneck(16, 16, shortcut=True, g=2),
     lambda: rep_blocks.Bottleneck(16, shortcut=True, groups=2), 16),
    ("crossconv", lambda M: M.CrossConv(8, 16, k=3, s=2, e=1.0),
     lambda: rep_blocks.CrossConv(16, kernel=3, stride=2), 8),
    ("focus", lambda M: M.Focus(3, 16, k=3),
     lambda: rep_blocks.Focus(16, 3), 3),
]


@pytest.mark.parametrize("name,tfac,ffac,cin",
                         CASES, ids=[c[0] for c in CASES])
def test_block_forward_parity(name, tfac, ffac, cin, ref_mod):
    rng = np.random.RandomState(7)
    tmodel = tfac(ref_mod)
    _randomize(tmodel, rng)
    x = rng.normal(0, 1, (2, cin, 16, 16)).astype(np.float32)
    _parity(tmodel, ffac(), x)


def test_fuse_matches_forward_fuse(ref_mod):
    """fuse_conv_bn == the reference's forward_fuse deploy path: fold BN
    into the conv, run the deploy graph, match the train graph's eval
    output AND torch's fused output."""
    rng = np.random.RandomState(11)
    tmodel = ref_mod.Conv(8, 16, k=3, s=1)
    _randomize(tmodel, rng)
    x_nchw = rng.normal(0, 1, (2, 8, 16, 16)).astype(np.float32)
    variables, x, want = _parity(
        tmodel, rep_blocks.ConvBnAct(16, 3), x_nchw)

    fused = rep_blocks.fuse_conv_bn(variables)
    got = rep_blocks.ConvBnAct(16, 3, deploy=True).apply(fused, x)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5, rtol=1e-4)

    # and against torch's own forward_fuse after manual conv+bn folding
    fused_t = torch.nn.utils.fuse_conv_bn_eval(tmodel.conv, tmodel.bn)
    tmodel.conv = fused_t
    tmodel.eval()
    with torch.no_grad():
        want_fused = tmodel.forward_fuse(torch.from_numpy(x_nchw)).numpy()
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want_fused,
        atol=2e-5, rtol=1e-4)


def test_focus_space_to_depth_order(ref_mod):
    """The slice-major channel order must match torch's dim-1 cat exactly
    (a wrong order still passes conv parity with transferred weights only
    by luck on symmetric inputs — pin it structurally)."""
    x = np.arange(2 * 3 * 4 * 4, dtype=np.float32).reshape(2, 3, 4, 4)
    want = torch.cat(
        (torch.from_numpy(x)[..., ::2, ::2],
         torch.from_numpy(x)[..., 1::2, ::2],
         torch.from_numpy(x)[..., ::2, 1::2],
         torch.from_numpy(x)[..., 1::2, 1::2]), 1).numpy()
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = jnp.concatenate(
        [xn[:, ::2, ::2, :], xn[:, 1::2, ::2, :],
         xn[:, ::2, 1::2, :], xn[:, 1::2, 1::2, :]], axis=-1)
    np.testing.assert_array_equal(
        np.asarray(got).transpose(0, 3, 1, 2), want)
