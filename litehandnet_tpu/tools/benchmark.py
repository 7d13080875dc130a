"""Model benchmark CLI — the reference `test_models_performance.ipynb`
equivalent: FLOPs (XLA cost analysis), parameter counts, and measured
on-device latency/FPS per model family.

Usage:
    python -m litehandnet_tpu.tools.benchmark [--models litehandnet resnet]
        [--size 256] [--batch 1] [--bf16]
"""

from __future__ import annotations

import argparse
import json
import time

DEFAULT_MODELS = [
    "litehandnet", "mynet", "hourglass", "hourglass_ablation", "litehrnet",
    "resnet", "mobilenetv2", "srhandnet",
]


def flops_of(fn, *args) -> float:
    """Total FLOPs of a jitted function via XLA cost analysis."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", -1.0))


def bench_model(name: str, size: int, batch: int, bf16: bool, reps: int = 30):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.models import fuse_params, get_model

    dtype = jnp.bfloat16 if bf16 else None
    model_kw = dict(name=name, output_channel=21)
    if name == "srhandnet":
        model_kw.update(output_channel=24, pred_bbox=True)
    cfg = config_from_dict(
        dict(
            MODEL=model_kw,
            DATASET=dict(
                num_joints=21, image_size=[size, size],
                heatmap_size=[size // 4, size // 4],
            ),
            PIPELINE=dict(simdr_split_ratio=0),
        )
    )
    rows = {}
    for mode in (["train_graph", "deployed"] if name == "litehandnet" else ["default"]):
        deploy = mode == "deployed"
        model = get_model(cfg, deploy=deploy, dtype=dtype)
        small = jnp.zeros((1, 64, 64, 3), dtype or jnp.float32)
        if deploy:
            train_model = get_model(cfg, deploy=False, dtype=dtype)
            tv = train_model.init(jax.random.PRNGKey(0), small, train=False)
            variables = fuse_params(tv)
        else:
            variables = model.init(jax.random.PRNGKey(0), small, train=False)
        n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
        x = jnp.zeros((batch, size, size, 3), dtype or jnp.float32)
        fn = lambda v, xx: model.apply(v, xx, train=False)
        flops = flops_of(fn, variables, x)
        fwd = jax.jit(fn)

        # warm + measure with host materialization (remote-TPU-safe timing)
        out = fwd(variables, x)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf)
        t0 = time.time()
        for _ in range(reps):
            out = fwd(variables, x)
        np.asarray(jax.tree.leaves(out)[0])
        dt = (time.time() - t0) / reps
        rows[mode] = dict(
            params_M=round(n_params / 1e6, 3),
            gflops=round(flops / 1e9, 3) if flops > 0 else None,
            latency_ms=round(dt * 1e3, 3),
            fps=round(batch / dt, 1),
        )
    return rows


def bench_throughput(name: str, size: int, batch: int, bf16: bool,
                     reps: int = 30):
    """Serving throughput: forward-only img/s at large batch (deploy-fused
    graph where the family has one). Same remote-TPU-safe methodology as
    bench_train_step: all reps dependency-chained in ONE lax.scan dispatch
    (a per-rep Python dispatch costs ~10-20 ms of tunnel round trip), the
    input perturbed per rep (identical repeated calls can be served from
    the remote execution cache), warmed 3x, best-of-3."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.models import fuse_params, get_model

    dtype = jnp.bfloat16 if bf16 else None
    model_kw = dict(name=name, output_channel=21)
    if name == "srhandnet":
        model_kw.update(output_channel=24, pred_bbox=True)
    cfg = config_from_dict(dict(
        MODEL=model_kw,
        DATASET=dict(num_joints=21, image_size=[size, size],
                     heatmap_size=[size // 4, size // 4]),
        PIPELINE=dict(simdr_split_ratio=0),
    ))
    deploy = name == "litehandnet"
    model = get_model(cfg, deploy=deploy, dtype=dtype)
    small = jnp.zeros((1, 64, 64, 3), dtype or jnp.float32)
    if deploy:
        tv = get_model(cfg, deploy=False, dtype=dtype).init(
            jax.random.PRNGKey(0), small, train=False
        )
        variables = fuse_params(tv)
    else:
        variables = model.init(jax.random.PRNGKey(0), small, train=False)

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.uniform(-1, 1, (batch, size, size, 3)), dtype or jnp.float32
    )

    @jax.jit
    def run(x, key):
        def body(carry, i):
            # per-rep input perturbation (cache-proof), chained through the
            # carry so XLA cannot parallelize or elide any rep
            eps = jax.random.uniform(jax.random.fold_in(key, i), ())
            xi = x + (carry + eps).astype(x.dtype) * jnp.asarray(
                1e-6, x.dtype
            )
            out = model.apply(variables, xi, train=False)
            leaf = jax.tree.leaves(out)[0]
            return jnp.mean(leaf).astype(jnp.float32), jnp.float32(0)

        carry, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return carry

    key = jax.random.PRNGKey(3)
    for w in range(3):
        float(run(x, jax.random.fold_in(key, w)))
    dts = []
    for t in range(3):
        t0 = time.time()
        float(run(x, jax.random.fold_in(key, 100 + t)))
        dts.append(time.time() - t0)
    dt = min(dts) / reps
    return dict(
        ms_per_batch=round(dt * 1e3, 2),
        img_per_sec=round(batch / dt, 1),
    )


def bench_train_step(name: str, size: int, batch: int, bf16: bool,
                     reps: int = 20):
    """Training throughput: full jitted train step (forward + backward + BN
    updates + Adam) on one chip. Steps are dependency-chained with ONE final
    host sync — per-step syncs measure the tunnel round-trip, not the TPU
    (and identical repeated calls can be served from the remote execution
    cache, so the input varies per step via the PRNG fold)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.losses import get_loss
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.train import TrainState, make_mesh, make_train_step

    hm = size // 4
    model_kw = dict(name=name, output_channel=21)
    hm_size = [hm, hm]
    loss_kw = dict(type="TopdownHeatmapLoss", loss_weight=[1.0],
                   auto_weight=False)
    if name == "srhandnet":
        # 4 outputs at /16, /16, /8, /4 with 21 kpts + 1 center + 2 wh
        # channels, trained with the multi-scale SRHandNetLoss
        model_kw = dict(name=name, output_channel=24, pred_bbox=True)
        hm_size = [[size // 16] * 2, [size // 16] * 2,
                   [size // 8] * 2, [size // 4] * 2]
        loss_kw = dict(type="SRHandNetLoss",
                       loss_weight=[0.1, 0.2, 0.3, 0.4])
    cfg = config_from_dict(dict(
        MODEL=model_kw,
        DATASET=dict(num_joints=21, image_size=[size, size],
                     heatmap_size=hm_size),
        PIPELINE=dict(simdr_split_ratio=0),
        LOSS=loss_kw,
    ))
    dtype = jnp.bfloat16 if bf16 else None
    model = get_model(cfg, dtype=dtype)
    crit = get_loss(cfg)
    tx = optax.adam(1e-3)
    step = make_train_step(model, crit, tx, make_mesh(1))

    small = jnp.zeros((1, 64, 64, 3), dtype or jnp.float32)
    mv = jax.jit(lambda k: model.init(k, small, train=False))(
        jax.random.PRNGKey(0)
    )
    rng = np.random.RandomState(0)
    if name == "srhandnet":
        target = [
            jnp.asarray(
                rng.uniform(0, 1, (batch, s[1], s[0], 24)).astype(np.float32)
            )
            for s in hm_size
        ]
        weight = jnp.ones((batch, 24))
    else:
        target = jnp.asarray(
            rng.uniform(0, 1, (batch, hm, hm, 21)).astype(np.float32)
        )
        weight = jnp.ones((batch, 21))
    b = {
        "img": jnp.asarray(
            rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
        ),
        "target": target,
        "target_weight": weight,
    }
    zeros_like_t = jax.tree.map(jnp.zeros_like, target)
    cv = crit.init(
        jax.random.PRNGKey(1), zeros_like_t,
        {"target": zeros_like_t, "target_weight": weight},
    )
    state = TrainState.create(mv, cv, tx)
    key = jax.random.PRNGKey(2)

    # run all steps inside ONE dispatch (lax.scan): over the remote-TPU
    # tunnel a per-step Python dispatch costs ~10-20 ms of round trip,
    # which would dominate a ~50 ms step
    @jax.jit
    def run(state, key):
        def body(st, i):
            st, metrics = step(st, b, jax.random.fold_in(key, i))
            return st, metrics["loss"]

        return jax.lax.scan(body, state, jnp.arange(reps))

    # compile + 2 warm dispatches: the FIRST run of a fresh executable has
    # measured up to ~4x steady-state (on-device warmup); distinct keys per
    # call because identical repeated calls can be served from the remote
    # execution cache and time as a no-op
    for w in range(3):
        np.asarray(run(state, jax.random.fold_in(key, w))[1])
    dts = []
    for t in range(3):
        t0 = time.time()
        np.asarray(run(state, jax.random.fold_in(key, 100 + t))[1])
        dts.append(time.time() - t0)
    dt = min(dts) / reps
    return dict(
        ms_per_step=round(dt * 1e3, 2),
        train_img_per_sec=round(batch / dt, 1),
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", default=DEFAULT_MODELS)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--reps", type=int, default=30)
    parser.add_argument("--train", action="store_true",
                        help="measure the full train step instead of the "
                             "inference forward")
    parser.add_argument("--throughput", action="store_true",
                        help="measure serving img/s (forward-only, scan-"
                             "chained; use with a large --batch, e.g. 128)")
    args = parser.parse_args(argv)

    bench_fn = (bench_throughput if args.throughput
                else bench_train_step if args.train
                else bench_model)
    results = {}
    for name in args.models:
        try:
            results[name] = bench_fn(
                name, args.size, args.batch, args.bf16, args.reps
            )
            print(f"{name}: {json.dumps(results[name])}", flush=True)
        except Exception as e:  # keep benchmarking the rest
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
    return results


if __name__ == "__main__":
    main()
