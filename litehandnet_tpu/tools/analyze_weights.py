"""Weight analysis CLI — the reference `utils/weight_analysis.py` equivalent:
per-layer parameter histograms and summary stats from a checkpoint.

Usage:
    python -m litehandnet_tpu.tools.analyze_weights --cfg <config> \
        [--load-best] [--out weights.json] [--top 20]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--load-best", action="store_true")
    parser.add_argument("--out", default=None)
    parser.add_argument("--top", type=int, default=20)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.train.checkpoint import CheckpointManager, run_dir
    from litehandnet_tpu.utils.profiling import parameter_histograms

    cfg = get_config(args.cfg)
    model = get_model(cfg)
    w, h = (int(v) for v in cfg.DATASET.image_size)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, min(h, 64), min(w, 64), 3)),
        train=False,
    )
    params = variables["params"]

    # raw restore: no template, so the analysis never depends on how the
    # training run was configured (crit_params / loss_scaler / optimizer tree)
    ckpt = CheckpointManager(run_dir(cfg), cfg, read_only=True)
    state, _ = ckpt.restore_raw(best=args.load_best)
    if state is not None:
        params = state["params"]
        print("analyzed restored checkpoint", flush=True)
    else:
        print("no checkpoint; analyzing init", flush=True)

    hists = parameter_histograms(params)
    rows = sorted(
        ((name, h["mean"], h["std"]) for name, h in hists.items()),
        key=lambda r: -abs(r[2]),
    )
    print(f"{'layer':60s} {'mean':>10s} {'std':>10s}")
    for name, mean, std in rows[: args.top]:
        print(f"{name[:60]:60s} {mean:10.4f} {std:10.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(hists, f)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
