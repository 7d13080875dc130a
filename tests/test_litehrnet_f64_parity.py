"""f64 one-step gradient + BN-EMA parity for litehrnet18 (VERDICT r4 #2).

The round-4 twin grid showed a systematic flax-favoring eval delta on both
litehrnet depths (ΔAUC +0.046/+0.027). This test pins the candidate
SEMANTIC explanations — the align-corners fuse resize gradient
(models/litehrnet.py:26-42), the double-fuse EMA quirk replication
(reference lite_hrnet.py:196-201), the BN EMA convention, the balanced
loss factors — by running both frameworks in float64 on CPU from
identical weights and one identical batch and requiring the loss, every
parameter gradient, and every BN running-stat update to agree far below
the level any of those bugs would produce (a wrong EMA factor or a biased
resize gradient moves its leaves at O(1e-3..1); the observed agreement is
~1e-7, the f32 noise floor of the production BatchNorm's deliberate f32
anchoring, layers.py:174).

Conclusion this test encodes: the litehrnet train step has no semantic
divergence; the twin delta is trajectory chaos (quantified separately by
the chaos-band replicates in TWIN_AUC.md).
"""

import numpy as np
import pytest

from tests import ref_loader

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not ref_loader.reference_available(),
                       reason="reference checkout absent"),
]


def test_litehrnet18_f64_grad_and_ema_parity(monkeypatch):
    import jax

    # x64 must be flipped for this test only; jax config is global, so
    # restore it even on failure
    old_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        _run()
    finally:
        jax.config.update("jax_enable_x64", old_x64)


def _run():
    import jax
    import jax.numpy as jnp

    from tests.test_forward_parity import sane_reinit

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.losses import get_loss
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.ops.encode import msra_heatmaps
    from litehandnet_tpu.utils.torch_import import import_torch_state_dict

    B, SIZE, K = 2, 64, 21
    HM = SIZE // 4
    rng = np.random.RandomState(0)

    refcfg = ref_loader.load_ref_config(
        "config/litehrnet/_2_freihand_224x244_dark_18.py")
    refcfg.DATASET.image_size = [SIZE, SIZE]
    refcfg.DATASET.heatmap_size = [HM, HM]
    tm = ref_loader.build_ref_model(refcfg)
    sane_reinit(tm)
    tm = tm.double()

    ref_loader.ensure_reference_importable()
    import importlib

    criterion_t = importlib.import_module("loss").get_loss(refcfg).double()

    cfg = config_from_dict(dict(refcfg))
    model = get_model(cfg)
    target_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    variables = import_torch_state_dict("litehrnet", tm.state_dict(),
                                        target_vars)
    variables = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), variables)
    criterion_f = get_loss(cfg)

    joints = rng.uniform(8, SIZE - 8, size=(B, K, 2)).astype(np.float64)
    tgt = np.stack([
        np.asarray(msra_heatmaps(j, np.ones(K), (SIZE, SIZE), (HM, HM),
                                 1.5, unbiased=True)[0])
        for j in joints]).astype(np.float64)
    weight = (rng.uniform(size=(B, K)) > 0.2).astype(np.float64)
    x_np = rng.uniform(-1, 1, (B, SIZE, SIZE, 3)).astype(np.float64)

    # ---- torch side: one train-mode forward + backward
    tm.train()
    out = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    loss_t, _ = criterion_t(out, {
        "target": torch.from_numpy(tgt.transpose(0, 3, 1, 2)),
        "target_weight": torch.from_numpy(weight[..., None]),
    })
    loss_t.backward()
    t_grads = {n: p.grad.detach().numpy() for n, p in tm.named_parameters()}
    t_sd_after = {k: v.detach().clone() for k, v in tm.state_dict().items()}

    # ---- flax side
    fb = {"target": jnp.asarray(tgt), "target_weight": jnp.asarray(weight)}

    def loss_fn(p, stats, x):
        o, mutated = model.apply({"params": p, "batch_stats": stats}, x,
                                 train=True, mutable=["batch_stats"])
        loss, _ = criterion_f.apply({"params": {}}, o, fb)
        return loss, mutated["batch_stats"]

    (loss_f, new_stats), grads_f = jax.value_and_grad(
        loss_fn, has_aux=True)(
        variables["params"], variables["batch_stats"], jnp.asarray(x_np))

    assert float(loss_f) == pytest.approx(float(loss_t.detach()), rel=1e-5)

    # gradients: reuse the state-dict import rules so leaf naming/layout
    # match (conv kernels transpose the same way gradients do)
    grad_sd = {
        k: torch.from_numpy(np.asarray(t_grads.get(k, v.detach().numpy())))
        for k, v in tm.state_dict().items()
    }
    grads_t = jax.tree.map(
        lambda a: np.asarray(a, np.float64),
        import_torch_state_dict("litehrnet", grad_sd, target_vars)["params"])

    flat_f = jax.tree_util.tree_flatten_with_path(grads_f)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(grads_t)[0]
    assert len(flat_f) == len(flat_t) > 100
    gmax = max(float(np.abs(np.asarray(g)).max()) for _, g in flat_t)
    for (pf, gf), (pt, gt) in zip(flat_f, flat_t):
        assert pf == pt, (pf, pt)
        gf, gt = np.asarray(gf), np.asarray(gt)
        # measured agreement ~3e-7 of gmax (f32 BN anchoring noise); a
        # semantic bug moves whole leaves at O(|g|). The absolute floor
        # also covers mathematically-zero leaves (conv bias before BN).
        absdiff = np.abs(gf - gt).max()
        assert absdiff <= 1e-4 * gmax + 1e-3 * np.abs(gt).max(), (
            jax.tree_util.keystr(pf), absdiff, gmax)

    # BN running stats after exactly one train-mode forward: the EMA
    # convention (momentum, biased-vs-unbiased var, double-fuse double
    # update) must match leaf-for-leaf
    stats_t = jax.tree.map(
        lambda a: np.asarray(a, np.float64),
        import_torch_state_dict(
            "litehrnet", t_sd_after, target_vars)["batch_stats"])
    flat_fs = jax.tree_util.tree_flatten_with_path(new_stats)[0]
    flat_ts = jax.tree_util.tree_flatten_with_path(stats_t)[0]
    assert len(flat_fs) == len(flat_ts) > 50
    for (pf, sf), (pt, st) in zip(flat_fs, flat_ts):
        assert pf == pt
        np.testing.assert_allclose(
            np.asarray(sf), np.asarray(st), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pf))
