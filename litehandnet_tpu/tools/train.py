"""Training CLI — the reference `dist_train.py` equivalent.

Usage:
    python -m litehandnet_tpu.tools.train --cfg <config.py-or-name> \
        [--num-devices N] [--coordinator host:port]

One process drives all local devices (single-controller JAX); multi-host
runs call `jax.distributed.initialize` via --coordinator instead of the
reference's mp.spawn/torchrun/SLURM launchers (dist_train.py:239-276).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="litehandnet_tpu trainer")
    parser.add_argument("--cfg", required=True, help="experiment config")
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--coordinator", default=None,
                        help="multi-host coordinator address")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--decode-procs", type=int, default=0,
                        help="decode worker PROCESSES (shared-memory pool, "
                             "data/mp_decode.py) instead of the in-process "
                             "thread pool; set ~cores-2 on a real TPU-VM "
                             "host (0 = in-process)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override cfg.TRAIN.total_epoches (smoke runs "
                             "/ budget-capped reproductions)")
    args = parser.parse_args(argv)

    import jax

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.data.loader import DataLoader
    from litehandnet_tpu.train.distributed import initialize_multihost, is_chief
    from litehandnet_tpu.train.trainer import Trainer

    initialize_multihost(args.coordinator)
    cfg = get_config(args.cfg)
    if args.epochs is not None:
        cfg.TRAIN.total_epoches = args.epochs

    # mesh spans ALL devices across processes; each process's loader
    # produces only its LOCAL rows (globalize_batch stitches them into the
    # global array inside the trainer)
    n_dev = args.num_devices or jax.device_count()
    batch = int(cfg.TRAIN.batch_per_gpu) * n_dev
    local_batch = batch * jax.local_device_count() // jax.device_count()
    train_loader = DataLoader(
        cfg, "train", batch_size=local_batch, num_workers=args.workers,
        seed=args.seed + jax.process_index(),
        decode_procs=args.decode_procs,
    )
    val_loader = DataLoader(
        cfg, "val", batch_size=local_batch, num_workers=args.workers,
        seed=args.seed, decode_procs=args.decode_procs,
    )
    steps_per_epoch = max(len(train_loader), 1)
    if is_chief():
        print(
            f"devices={n_dev} global_batch={batch} "
            f"steps/epoch={steps_per_epoch} "
            f"train={len(train_loader.dataset)} val={len(val_loader.dataset)}",
            flush=True,
        )

    trainer = Trainer(cfg, steps_per_epoch, num_devices=n_dev)
    sample = next(iter(train_loader.batches(0)))
    state = trainer.init_state(sample, seed=args.seed)

    def train_batches(epoch):
        for b in train_loader.batches(epoch):
            yield {k: v for k, v in b.items()
                   if k in ("img", "target", "target_weight", "simdr_x", "simdr_y")}

    def val_batches():
        for b in val_loader.batches(0):
            yield {k: v for k, v in b.items()
                   if k in ("img", "target", "target_weight", "simdr_x", "simdr_y")}

    try:
        state = trainer.fit(state, train_batches, val_batches,
                            seed=args.seed)
    finally:
        train_loader.close()
        val_loader.close()
    if is_chief():
        print("training complete", flush=True)
    return state


if __name__ == "__main__":
    main()
