"""Migrate a reference PyTorch checkpoint into this framework's run layout.

The reference trains to ``.pth`` dicts ``{epoch, state_dict, optimizer,
config, min_val_loss}`` (dist_train.py:212-233) or bare state_dicts. This
CLI converts one into an orbax checkpoint in the experiment's run directory
(``save_root/dataset/model/ID/``), so ``tools/test.py --cfg ... --load-best``
(and ``reproduce_auc --eval-only``) evaluate migrated reference models with
no code. Conversion itself is `utils/torch_import.import_torch_state_dict`
(the rule tables behind the 11-family forward-parity suite, ~1e-6 rel).

Criterion-owned parameters (the SimDR linear decoders,
loss/centernet_simdr_loss.py:42-69) are freshly initialized: the
reference's own checkpoints store only ``model.state_dict()``, so they are
not present in the source file either.

Usage:
    python -m litehandnet_tpu.tools.import_checkpoint \
        --cfg litehandnet/freihand_256_dark_h4_ca_r4 \
        --pth best_model.pth [--slot best] [--family litehandnet]
"""

from __future__ import annotations

import argparse


def _synth_crit_batch(out0, cfg):
    """Zero-filled criterion-init batch matching the model's output
    structure (list of scales / stacked array / (hms, pred_x, pred_y))."""
    import jax.numpy as jnp

    k = int(cfg.DATASET.num_joints)
    simdr = int(cfg.PIPELINE.get("simdr_split_ratio", 0) or 0)
    if (isinstance(out0, (list, tuple)) and len(out0) == 3
            and getattr(out0[1], "ndim", 0) == 3):
        # stacked mynet with SimDR heads: (heatmaps, pred_x, pred_y)
        hms, px, py = out0
        hm0 = hms[0] if isinstance(hms, (list, tuple)) else hms
        return {
            "target": jnp.zeros_like(hm0),
            "target_weight": jnp.ones((1, hm0.shape[-1])),
            "simdr_x": jnp.zeros_like(px),
            "simdr_y": jnp.zeros_like(py),
        }
    if isinstance(out0, (list, tuple)):  # multi-scale (srhandnet)
        return {
            "target": [jnp.zeros_like(o) for o in out0],
            "target_weight": [jnp.ones((1, o.shape[-1])) for o in out0],
        }
    batch = {
        "target": jnp.zeros_like(out0),
        "target_weight": jnp.ones((1, out0.shape[-1])),
    }
    if simdr:
        w, h = cfg.DATASET.image_size
        batch["simdr_x"] = jnp.zeros((1, k, int(w * simdr)))
        batch["simdr_y"] = jnp.zeros((1, k, int(h * simdr)))
    return batch


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="torch .pth -> orbax checkpoint in the run directory"
    )
    parser.add_argument("--cfg", required=True, help="experiment config")
    parser.add_argument("--pth", required=True, help="torch checkpoint file")
    parser.add_argument("--family", default=None,
                        help="import-rule family (default: cfg.MODEL.name)")
    parser.add_argument("--slot", choices=["best", "latest", "both"],
                        default="both",
                        help="which checkpoint slot(s) to write")
    parser.add_argument("--force", action="store_true",
                        help="overwrite existing checkpoints in the run "
                             "directory")
    args = parser.parse_args(argv)

    import torch

    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.losses import get_loss
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.train.checkpoint import CheckpointManager, run_dir
    from litehandnet_tpu.train.optim import make_optimizer_from_config
    from litehandnet_tpu.train.state import TrainState
    from litehandnet_tpu.utils.torch_import import import_torch_state_dict

    cfg = get_config(args.cfg)
    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    if isinstance(ckpt, torch.jit.ScriptModule):
        # TorchScript archive (torch.load auto-dispatches zip archives to
        # torch.jit.load): the route for the author's published
        # `srhandnet.pts` (reference SRhandNet.py:9-38, the one entry point
        # that ingests a serialized module instead of a state_dict). The
        # scripted module's state_dict carries the original attribute
        # names, so the same per-family conversion rules apply.
        ckpt = {"state_dict": ckpt.state_dict()}
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) \
        else ckpt
    # DDP checkpoints prefix every key with "module."
    state_dict = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }
    epoch = int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0
    min_val_loss = float(ckpt.get("min_val_loss", float("inf"))) \
        if isinstance(ckpt, dict) else float("inf")

    model = get_model(cfg)
    w, h = cfg.DATASET.image_size
    x0 = jnp.zeros((1, int(h), int(w), 3))
    mv = model.init(jax.random.PRNGKey(0), x0, train=False)
    mv = import_torch_state_dict(
        args.family or cfg.MODEL.name, state_dict, mv
    )

    crit = get_loss(cfg)
    out0 = model.apply(mv, x0, train=False)
    cv = crit.init(
        jax.random.PRNGKey(1), out0, _synth_crit_batch(out0, cfg)
    ) if hasattr(crit, "init") else {}
    tx, _ = make_optimizer_from_config(cfg, steps_per_epoch=1)
    scaler = None
    if cfg.TRAIN.get("loss_scale", False):
        from litehandnet_tpu.train.precision import DynamicLossScaler

        scaler = DynamicLossScaler.create()
    state = TrainState.create(mv, cv, tx, loss_scaler=scaler)

    out_dir = run_dir(cfg)
    slots = ("best", "latest") if args.slot == "both" else (args.slot,)
    if not args.force:
        # never silently clobber a trained run (best_model.pth equivalents)
        import os

        existing = [
            s for s in slots if os.path.exists(os.path.join(
                out_dir, "best" if s == "best" else "checkpoint"
            ))
        ]
        if existing:
            raise SystemExit(
                f"refusing to overwrite existing checkpoint slot(s) "
                f"{existing} in {out_dir}; pass --force to replace them"
            )
    mgr = CheckpointManager(out_dir, cfg)
    for slot in slots:
        mgr.save(state, epoch=epoch, min_val_loss=min_val_loss,
                 best=slot == "best", wait=True)
    print(f"imported {args.pth} -> {out_dir} (slots: {', '.join(slots)}, "
          f"epoch {epoch})", flush=True)
    return out_dir


if __name__ == "__main__":
    main()
