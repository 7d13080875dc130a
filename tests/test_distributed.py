"""DP train-step tests on a virtual 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.losses import get_loss
from litehandnet_tpu.models import get_model
from litehandnet_tpu.train import (
    TrainState,
    make_eval_step,
    make_mesh,
    make_train_step,
)
from litehandnet_tpu.train.optim import make_optimizer_from_config


def _cfg(sync_bn=True, ca_type="ca"):
    return config_from_dict(
        dict(
            MODEL=dict(
                name="litehandnet", num_stage=3, num_block=[1, 1],
                input_channel=32, ca_type=ca_type, reduction=2,
                activation="leakyrelu", output_channel=21,
            ),
            DATASET=dict(num_joints=21, image_size=[64, 64], heatmap_size=[16, 16]),
            PIPELINE=dict(simdr_split_ratio=0),
            TRAIN=dict(total_epoches=2, batch_per_gpu=2, syncBN=sync_bn),
            OPTIMIZER=dict(type="Adam", lr=1e-3, warmup_steps=0, step_epoch=[1]),
            LOSS=dict(type="TopdownHeatmapLoss", loss_weight=[1.0, 0.1], auto_weight=False),
        )
    )


def _setup(sync_bn=True, n_dev=8, ca_type="ca", lr_world_size=None):
    cfg = _cfg(sync_bn, ca_type)
    mesh = make_mesh(n_dev)
    model = get_model(
        cfg, axis_name="data" if (sync_bn and n_dev > 1) else None
    )
    crit = get_loss(cfg)
    x = jnp.zeros((n_dev, 64, 64, 3))
    batch = {
        "img": x,
        "target": jnp.zeros((n_dev, 16, 16, 21)),
        "target_weight": jnp.ones((n_dev, 21)),
    }
    mv = model.init(jax.random.PRNGKey(0), x, train=False)
    cv = crit.init(jax.random.PRNGKey(1), batch["target"], batch)
    tx, _ = make_optimizer_from_config(
        cfg, steps_per_epoch=10,
        world_size=n_dev if lr_world_size is None else lr_world_size,
    )
    state = TrainState.create(mv, cv, tx)
    return cfg, mesh, model, crit, tx, state, batch


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


@pytest.mark.parametrize("sync_bn", [
    True, pytest.param(False, marks=pytest.mark.slow),
])
def test_train_step_runs_and_learns(sync_bn, rng):
    cfg, mesh, model, crit, tx, state, batch = _setup(sync_bn)
    step = make_train_step(model, crit, tx, mesh, donate=False)
    imgs = jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, size=(8, 16, 16, 21)).astype(np.float32))
    batch = dict(batch, img=imgs, target=target)
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


@pytest.mark.slow
def test_dp_matches_single_device(rng):
    """8-way DP on a replicated batch must match 1-device training (the
    gradient pmean over identical shards is an identity). Uses the SE
    attention variant: ChannelAttention dropout draws per-device masks by
    design, which would (correctly) break this equivalence; LR is held
    fixed since the reference scales it by world size."""
    imgs = np.tile(rng.normal(size=(1, 64, 64, 3)).astype(np.float32), (8, 1, 1, 1))
    target = np.tile(
        rng.uniform(0, 1, size=(1, 16, 16, 21)).astype(np.float32), (8, 1, 1, 1)
    )

    results = {}
    for n_dev in (1, 8):
        cfg, mesh, model, crit, tx, state, _ = _setup(
            sync_bn=True, n_dev=n_dev, ca_type="se", lr_world_size=1
        )
        step = make_train_step(model, crit, tx, mesh, donate=False)
        batch = {
            "img": jnp.asarray(imgs[:n_dev]),
            "target": jnp.asarray(target[:n_dev]),
            "target_weight": jnp.ones((n_dev, 21)),
        }
        key = jax.random.PRNGKey(0)
        state, metrics = step(state, batch, key)
        results[n_dev] = (
            np.asarray(jax.tree.leaves(state.params)[0]),
            float(metrics["loss"]),
        )
    # first-step loss must agree to float rounding; later steps drift via
    # Adam-amplified rounding (verified ~1e-4 at step 2, not a semantic gap)
    np.testing.assert_allclose(results[1][1], results[8][1], rtol=1e-5)
    np.testing.assert_allclose(results[1][0], results[8][0], rtol=1e-3, atol=1e-6)


def test_remat_matches_plain_step(rng):
    """`remat=True` (jax.checkpoint around the train-mode forward, env knob
    LHN_REMAT) must be a pure memory/speed trade: same loss and same
    parameter update as the plain step, to float-refusion rounding
    (checkpoint moves XLA fusion boundaries, so bitwise equality is not
    expected — measured ~1e-6 relative; the v5e A/B is PROFILE.md
    §train-r4(d))."""
    imgs = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
    target = rng.uniform(0, 1, size=(8, 16, 16, 21)).astype(np.float32)
    results = {}
    for remat in (False, True):
        cfg, mesh, model, crit, tx, state, _ = _setup(sync_bn=True)
        step = make_train_step(
            model, crit, tx, mesh, donate=False, remat=remat
        )
        batch = {
            "img": jnp.asarray(imgs),
            "target": jnp.asarray(target),
            "target_weight": jnp.ones((8, 21)),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        results[remat] = (
            np.asarray(jax.tree.leaves(state.params)[0]),
            np.asarray(jax.tree.leaves(state.batch_stats)[0]),
            float(metrics["loss"]),
        )
    np.testing.assert_allclose(results[False][2], results[True][2], rtol=1e-5)
    np.testing.assert_allclose(
        results[False][0], results[True][0], rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        results[False][1], results[True][1], rtol=1e-4, atol=1e-7
    )


def test_loss_scaler_wired(rng):
    """DynamicLossScaler through the real train step (reference
    train/fp16_utils/loss_scaler.py:81-212 + fp16_optimizer.py:336-489):
    (a) with finite grads, a power-of-two scale cancels exactly, so the
    scaled run matches the unscaled one; (b) a batch that produces
    non-finite grads skips the update (params/opt-state unchanged) and
    halves the scale."""
    from litehandnet_tpu.train.precision import DynamicLossScaler

    imgs = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
    target = rng.uniform(0, 1, size=(8, 16, 16, 21)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    params_by_mode = {}
    for scaled in (False, True):
        cfg, mesh, model, crit, tx, state, _ = _setup(sync_bn=True)
        if scaled:
            state = state.replace(
                loss_scaler=DynamicLossScaler.create(init_scale=2.0**10)
            )
        step = make_train_step(model, crit, tx, mesh, donate=False)
        batch = {
            "img": jnp.asarray(imgs),
            "target": jnp.asarray(target),
            "target_weight": jnp.ones((8, 21)),
        }
        for i in range(2):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
        params_by_mode[scaled] = jax.tree.leaves(state.params)
        if scaled:
            # finite steps: scale held (window=1000 not reached), steps count
            assert float(state.loss_scaler.scale) == 2.0**10
            assert int(state.loss_scaler.good_steps) == 2
            # (b) non-finite gradients: update skipped, scale halved
            bad = dict(batch, img=jnp.full_like(batch["img"], jnp.nan))
            before = jax.tree.leaves(state.params)
            before_stats = jax.tree.leaves(state.batch_stats)
            state2, _ = step(state, bad, jax.random.fold_in(key, 9))
            for a, b in zip(before, jax.tree.leaves(state2.params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            # the overflowing forward's NaN batch statistics must NOT be
            # committed — a "skipped" step may not poison the BN EMAs
            for a, b in zip(
                before_stats, jax.tree.leaves(state2.batch_stats)
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert float(state2.loss_scaler.scale) == 2.0**9
            assert int(state2.loss_scaler.good_steps) == 0
    for a, b in zip(params_by_mode[False], params_by_mode[True]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )


def test_eval_step(rng):
    cfg, mesh, model, crit, tx, state, batch = _setup()
    estep = make_eval_step(model, crit, mesh)
    out, metrics = estep(state, batch)
    assert out.shape == (8, 16, 16, 21)
    assert np.isfinite(float(metrics["loss"]))


def test_initialize_multihost_runs_before_backend_init():
    """initialize_multihost must call jax.distributed.initialize BEFORE any
    backend-touching jax API (the round-1 version queried jax.process_count()
    first, which initializes the local backend and poisons the rendezvous).
    Run in a subprocess so jax starts cold."""
    import subprocess
    import sys

    code = """
import os

import jax
import jax._src.xla_bridge as xb

calls = {}

def fake_initialize(coordinator_address=None, num_processes=None,
                    process_id=None, **kw):
    # the local backend must not be initialized yet
    assert not xb._backends, "backend initialized before distributed.initialize"
    calls["coordinator"] = coordinator_address
    calls["num_processes"] = num_processes
    calls["process_id"] = process_id

jax.distributed.initialize = fake_initialize

from litehandnet_tpu.train.distributed import initialize_multihost

initialize_multihost(None)                       # no-op without coordinator
assert not calls
initialize_multihost("10.0.0.1:1234", num_processes=4, process_id=1)
assert calls == {"coordinator": "10.0.0.1:1234", "num_processes": 4,
                 "process_id": 1}, calls
calls.clear()
initialize_multihost("10.0.0.1:1234")            # idempotent: second call no-op
assert not calls
print("OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd="/root/repo", timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


def test_to_global_handles_multiscale_lists():
    """globalize_batch's converter must globalize LIST-valued entries
    (srhandnet multi-scale targets from the device pipeline) element-wise —
    skipping them would mix a global img with process-local targets in a
    multi-host srhandnet run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from litehandnet_tpu.train.distributed import _to_global, make_mesh

    mesh = make_mesh(2)
    sharding = NamedSharding(mesh, P("data"))
    scales = [np.ones((4, s, s, 24), np.float32) for s in (4, 8, 16)]
    out = _to_global(scales, sharding)
    assert isinstance(out, list) and len(out) == 3
    for o, s in zip(out, scales):
        assert isinstance(o, jax.Array) and o.shape == s.shape
        assert o.sharding.spec == P("data")
    # scalars and strings pass through untouched
    assert _to_global(3, sharding) == 3
    assert _to_global("path.jpg", sharding) == "path.jpg"
