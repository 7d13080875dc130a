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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", default=DEFAULT_MODELS)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--reps", type=int, default=30)
    args = parser.parse_args(argv)

    results = {}
    for name in args.models:
        try:
            results[name] = bench_model(
                name, args.size, args.batch, args.bf16, args.reps
            )
            print(f"{name}: {json.dumps(results[name])}", flush=True)
        except Exception as e:  # keep benchmarking the rest
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
    return results


if __name__ == "__main__":
    main()
