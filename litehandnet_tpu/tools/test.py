"""Evaluation CLI — the reference `test.py` equivalent.

Usage:
    python -m litehandnet_tpu.tools.test --cfg <config> [--load-best] \
        [--vis-dir out/]

Loads a checkpoint, fuses re-parameterizable models for deployment
(reference test.py:106-107), runs the batched decode, reports PCK/AUC/EPE
(or the dataset's metric set), and dumps `best_pth_metric.json` plus optional
visualization grids (reference test.py:53-61, 149-154).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="litehandnet_tpu evaluator")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--load-best", action="store_true")
    parser.add_argument("--train", action="store_true",
                        help="evaluate the train split (reference "
                             "test.py:41-44,71-73)")
    parser.add_argument("--allow-init", action="store_true",
                        help="evaluate random init when no checkpoint exists "
                             "(the reference raises, test.py:100-101)")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the eval batch over every local device "
                             "(preprocess + forward run SPMD on a 1-D data "
                             "mesh) — the reference's nn.DataParallel eval "
                             "wrap (test.py:81); batch-size must divide the "
                             "device count")
    parser.add_argument("--vis-dir", default=None)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--decode-procs", type=int, default=0,
                        help="decode worker processes (0 = in-process)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.data.loader import DataLoader
    from litehandnet_tpu.eval.decoder import TopDownDecoder
    from litehandnet_tpu.losses import get_loss
    from litehandnet_tpu.models import fuse_params, get_model
    from litehandnet_tpu.train.checkpoint import CheckpointManager, run_dir
    from litehandnet_tpu.train.optim import make_optimizer_from_config
    from litehandnet_tpu.train.state import TrainState

    cfg = get_config(args.cfg)
    if args.train:
        # point the test split at the train annotations (test.py:71-73)
        cfg.DATASET.test.ann_file = cfg.DATASET.train.ann_file
        cfg.DATASET.test.img_prefix = cfg.DATASET.train.img_prefix
    dtype = jnp.bfloat16 if args.bf16 else None

    sharding = None
    if args.data_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from litehandnet_tpu.train.distributed import make_mesh

        mesh = make_mesh(jax.local_device_count())
        sharding = NamedSharding(mesh, P("data"))
        if args.batch_size % jax.local_device_count():
            raise SystemExit(
                f"--batch-size {args.batch_size} must divide the "
                f"{jax.local_device_count()} local devices")

    loader = DataLoader(
        cfg, "test", batch_size=args.batch_size, use_device_pipeline=True,
        decode_procs=args.decode_procs, sharding=sharding,
    )
    try:
        decoder = TopDownDecoder(cfg)

        # restore train-mode state, then fuse to the deploy graph when available
        model = get_model(cfg)
        crit = get_loss(cfg)
        sample = next(iter(loader.batches(0)))
        mv = model.init(jax.random.PRNGKey(0), jnp.asarray(sample["img"][:1]),
                        train=False)
        # pass the raw model output structure: each criterion knows its own
        # shape (tuple of scales for SRHandNetLoss, stacked array for hourglass)
        out0 = model.apply(mv, jnp.asarray(sample["img"][:1]), train=False)
        sample1 = {
            k: (np.asarray(v)[:1] if hasattr(v, "shape") else v)
            for k, v in sample.items()
        }
        cv = crit.init(jax.random.PRNGKey(1), out0, sample1) if hasattr(
            crit, "init") else {}
        tx, _ = make_optimizer_from_config(cfg, steps_per_epoch=1)
        scaler = None
        if cfg.TRAIN.get("loss_scale", False):
            # the restore template's tree structure must match what the trainer
            # saved — loss_scale runs checkpoint a DynamicLossScaler subtree
            from litehandnet_tpu.train.precision import DynamicLossScaler

            scaler = DynamicLossScaler.create()
        template = TrainState.create(mv, cv, tx, loss_scaler=scaler)
        # read_only: evaluation must not rewrite the training run's recorded
        # config.json (especially under --train, where cfg is mutated above)
        ckpt = CheckpointManager(run_dir(cfg), cfg, read_only=True)
        state, meta = ckpt.restore(template, best=args.load_best)
        if state is None:
            if not args.allow_init:
                # the reference refuses to evaluate without a trained model
                # (test.py:100-101)
                raise FileNotFoundError(
                    f"model not exist! no checkpoint under {run_dir(cfg)} "
                    "(pass --allow-init to evaluate random init)"
                )
            print("no checkpoint found; evaluating random init", flush=True)
            state = template
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        if cfg.MODEL.name.lower() == "litehandnet":
            # deploy-mode fusion (reference test.py:106-107)
            model = get_model(cfg, deploy=True, dtype=dtype)
            variables = fuse_params(variables)
        if sharding is not None:
            # replicate params over the mesh; the sharded batch then drives
            # the whole forward SPMD (computation follows data)
            from jax.sharding import NamedSharding, PartitionSpec as P

            variables = jax.device_put(
                variables, NamedSharding(sharding.mesh, P()))

        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

        simdr_k = int(cfg.PIPELINE.get("simdr_split_ratio", 0) or 0)
        results = []
        simdr_results = []
        for batch in loader.batches(0):
            img = jnp.asarray(batch["img"], jnp.bfloat16 if args.bf16 else None)
            outputs = fwd(variables, img)
            meta_batch = {
                k: batch[k]
                for k in ("center", "scale", "image_file", "bbox_id", "bbox_score")
            }
            pred_x = pred_y = None
            if isinstance(outputs, (tuple, list)):
                if (
                    len(outputs) == 3
                    and getattr(outputs[-1], "ndim", 0) == 3
                ):
                    # stacked mynet with SimDR heads: (hm_preds, pred_x, pred_y)
                    outputs, pred_x, pred_y = outputs
                if isinstance(outputs, (tuple, list)):
                    outputs = outputs[-1]  # srhandnet finest scale / last stack
            if outputs.ndim == 5:
                outputs = outputs[:, -1]  # stacked hourglass: last stack
            # drop region-map channels (center + w/h) when present
            outputs = outputs[..., : cfg.DATASET.num_joints]
            results.append(decoder.decode(meta_batch, np.asarray(outputs, np.float32)))
            if simdr_k > 0 and pred_x is not None:
                # fuse the SimDR decode alongside the heatmap decode (reference
                # test.py:117-147; the reference's decode_simdr read the GT
                # simdr targets from meta — here the MODEL's pred_x/y are used)
                simdr_results.append(decoder.decode_simdr(
                    meta_batch, np.asarray(pred_x, np.float32),
                    np.asarray(pred_y, np.float32),
                ))

        metric = cfg.EVAL.get("metric", ["PCK", "AUC", "EPE"])
        name_value = loader.dataset.evaluate(results, metric=metric)
        print(json.dumps({k: float(v) for k, v in name_value.items()}, indent=2))

        out_dir = args.vis_dir or run_dir(cfg)
        os.makedirs(out_dir, exist_ok=True)
        # file name tracks which slot was evaluated (reference test.py:53-61);
        # --train runs get a distinct prefix so a train-split evaluation
        # never overwrites recorded test-split metrics (the reference
        # overwrites the same file for both)
        metric_file = ("best_pth_metric.json" if args.load_best
                       else "checkpoint_pth_metric.json")
        if args.train:
            metric_file = "train_" + metric_file
        with open(os.path.join(out_dir, metric_file), "w") as f:
            json.dump({k: float(v) for k, v in name_value.items()}, f, indent=2)

        if simdr_results:
            simdr_metrics = loader.dataset.evaluate(simdr_results, metric=["AUC"])
            print("SimDR:", json.dumps(
                {k: float(v) for k, v in simdr_metrics.items()}, indent=2))
            with open(os.path.join(out_dir, "simdr_metric.json"), "w") as f:
                json.dump(
                    {k: float(v) for k, v in simdr_metrics.items()}, f, indent=2)
            name_value = dict(name_value, **{
                f"simdr_{k}": v for k, v in simdr_metrics.items()
            })

        if args.vis_dir:
            from litehandnet_tpu.utils.vis import SaveResultImages

            saver = SaveResultImages(loader.dataset, args.vis_dir)
            last = results[-1]
            hm_size = cfg.DATASET.heatmap_size
            if hm_size and isinstance(hm_size[0], (list, tuple)):
                hm_size = hm_size[-1]  # multi-scale (SRHandNet): finest scale
            saver.save_images_with_joints(
                batch["img"], last["hm_preds"] * (
                    np.asarray(cfg.DATASET.image_size)[None, None]
                    / np.asarray(hm_size)[None, None]
                ),
                None, name="pred_joints.png",
            )
            saver.save_images_with_heatmap(
                batch["img"], last["output_heatmap"], name="pred_heatmaps.png"
            )
        return name_value
    finally:
        # release decode worker processes + shared memory even on
        # mid-eval failure (reproduce_auc keeps going per cell)
        loader.close()


if __name__ == "__main__":
    main()
