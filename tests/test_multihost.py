"""REAL two-process multi-host execution (VERDICT round-2 item 5).

Spawns 2 actual OS processes, each with 2 virtual CPU devices, rendezvoused
through ``initialize_multihost`` (localhost coordinator; Gloo collectives):
each process feeds ONLY its local half of the global batch through
``globalize_batch`` and runs one ``make_train_step`` over the 2x2-device
global mesh with SyncBN. The replicated loss and updated params must match
a single-process 4-device run on the concatenated batch — proving the
multi-host path (jax.distributed init ordering, process-local data
stitching, cross-process pmean/psum) actually EXECUTES, not just imports.

Reference surface being replaced: train/distributed_utils.py:7-29 (tcp://
rendezvous) + spawn_dist.py per-rank DDP processes.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import os.path as osp

REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

_WORKER = r"""
import json, os, sys

sys.path.insert(0, sys.argv[3])  # repo root, passed by the spawning test
pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

jax.config.update("jax_platforms", "cpu")

from litehandnet_tpu.train.distributed import (
    globalize_batch, initialize_multihost, make_mesh, make_train_step,
)

# multi-host bring-up FIRST (before any backend-touching jax call)
initialize_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 4

from tests.test_multihost import build_problem

cfg, model, crit, tx, state, imgs, target = build_problem()
mesh = make_mesh()  # all 4 global devices
# replicate the (identically-seeded) state across the global mesh
state = jax.device_put(state, NamedSharding(mesh, P()))

# this process's local rows: devices are ordered process-major, so
# process p owns global rows [p*4, (p+1)*4) of the batch-8 array
lo, hi = pid * 4, (pid + 1) * 4
batch_local = {
    "img": imgs[lo:hi],
    "target": target[lo:hi],
    "target_weight": np.ones((4, 21), np.float32),
}
batch = globalize_batch(batch_local, mesh)

step = make_train_step(model, crit, tx, mesh, donate=False)
state, metrics = step(state, batch, jax.random.PRNGKey(42))
leaves = jax.tree.leaves(state.params)

# collective checkpoint save: EVERY process must enter (orbax barriers
# internally and elects the writer) — a chief-only save deadlocks here
from litehandnet_tpu.train.checkpoint import CheckpointManager

mgr = CheckpointManager(sys.argv[4])
mgr.save(state, epoch=0, min_val_loss=float(metrics["loss"]))

print("RESULT" + json.dumps({
    "pid": pid,
    "loss": float(metrics["loss"]),
    "psum": float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves)),
    "first": np.asarray(leaves[0]).ravel()[:4].tolist(),
    "ckpt": True,
}), flush=True)
"""


def build_problem():
    """Shared tiny problem: deterministic data + identically-seeded state.
    Imported by BOTH the in-process reference run and the spawned workers,
    so any divergence is the multi-host runtime's doing."""
    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.losses import get_loss
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.train import TrainState
    from litehandnet_tpu.train.optim import make_optimizer_from_config

    cfg = config_from_dict(dict(
        MODEL=dict(
            name="litehandnet", num_stage=3, num_block=[1, 1],
            input_channel=32, ca_type="se", reduction=2,
            activation="leakyrelu", output_channel=21,
        ),
        DATASET=dict(num_joints=21, image_size=[64, 64],
                     heatmap_size=[16, 16]),
        PIPELINE=dict(simdr_split_ratio=0),
        TRAIN=dict(total_epoches=2, batch_per_gpu=2, syncBN=True),
        OPTIMIZER=dict(type="Adam", lr=1e-3, warmup_steps=0, step_epoch=[1]),
        LOSS=dict(type="TopdownHeatmapLoss", loss_weight=[1.0, 0.1],
                  auto_weight=False),
    ))
    model = get_model(cfg, axis_name="data")
    crit = get_loss(cfg)
    rng = np.random.RandomState(3)
    imgs = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
    target = rng.uniform(0, 1, size=(8, 16, 16, 21)).astype(np.float32)
    mv = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                    train=False)
    batch1 = {
        "img": imgs[:1], "target": target[:1],
        "target_weight": np.ones((1, 21), np.float32),
    }
    cv = crit.init(jax.random.PRNGKey(1), jnp.asarray(target[:1]), batch1)
    tx, _ = make_optimizer_from_config(cfg, steps_per_epoch=10, world_size=1)
    state = TrainState.create(mv, cv, tx)
    return cfg, model, crit, tx, state, imgs, target


@pytest.mark.slow
def test_two_process_multihost_matches_single_process(tmp_path):
    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.train.distributed import make_mesh, make_train_step

    # -- reference: single process, 4 devices, full batch ----------------
    cfg, model, crit, tx, state, imgs, target = build_problem()
    mesh = make_mesh(4)
    batch = {
        "img": imgs, "target": target,
        "target_weight": np.ones((8, 21), np.float32),
    }
    step = make_train_step(model, crit, tx, mesh, donate=False)
    ref_state, ref_metrics = step(state, batch, jax.random.PRNGKey(42))
    leaves = jax.tree.leaves(ref_state.params)
    ref = {
        "loss": float(ref_metrics["loss"]),
        "psum": float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves)),
        "first": np.asarray(leaves[0]).ravel()[:4].tolist(),
    }

    # -- 2 real processes over a localhost coordinator -------------------
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:  # free port
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(p), port, REPO_ROOT,
             str(tmp_path / "mh_ckpts")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO_ROOT,
        )
        for p in (0, 1)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        for line in out.splitlines():
            if line.startswith("RESULT"):
                r = json.loads(line[len("RESULT"):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}

    # both processes agree with each other AND with the 1-process run
    for pid in (0, 1):
        r = results[pid]
        assert r["loss"] == pytest.approx(ref["loss"], rel=1e-5), (r, ref)
        assert r["psum"] == pytest.approx(ref["psum"], rel=1e-5)
        np.testing.assert_allclose(r["first"], ref["first"], rtol=1e-4,
                                   atol=1e-7)
        assert r["ckpt"]
    # the collective save completed (both processes entered orbax's save
    # barrier — a chief-only save would have hung the workers) and the
    # chief wrote the side-car meta
    ckpt_dir = tmp_path / "mh_ckpts"
    assert (ckpt_dir / "checkpoint").exists()
    assert (ckpt_dir / "checkpoint.meta.json").exists()
