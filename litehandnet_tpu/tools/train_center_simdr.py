"""Gen-1 workflow: center-map + SimDR training with cycle detection.

Reference: train_distributed_center_simdr_{freihand,mpii}.py — the stacked
MS-attention hourglass with region maps + SimDR heads, a per-epoch sine-decay
LR schedule (:110-113), a cycle-detection second training pass (GT bbox
crops re-forwarded with prob 0.6, :203-211), and evaluation via ResultParser
AP + multi-hand PCK (:240-278).

TPU redesign: the cycle-detection pass is not a dynamic tensor crop — the
GT bbox becomes a new (center, scale) for the SAME fused device pipeline at
half resolution, producing a second static-shape batch; both passes are
jitted DP train steps over the mesh.

Usage:
    python -m litehandnet_tpu.tools.train_center_simdr --cfg <config>
"""

from __future__ import annotations

import argparse

import numpy as np


def sine_decay_schedule(base_lr: float, steps_per_epoch: int, T: int = 40,
                        lr_gamma: float = 0.5):
    """Per-epoch sine-decay schedule (reference :110-113).

    The reference steps its LambdaLR only while lr > 5e-7 (:215-217); the
    cosine reaches ~0 at the end of the FIRST period, so the scheduler
    freezes there and the ``epoch % period`` restart never actually fires.
    This schedule reproduces that de-facto behavior: one cosine decay,
    floored at 5e-7 (the frozen reference value lies in [0, 5e-7])."""

    def schedule(step):
        import jax.numpy as jnp

        epoch = step / steps_per_epoch
        period = T + epoch / T
        frac = jnp.minimum(epoch / period, 1.0)
        lr = base_lr * jnp.cos(frac * jnp.pi / 2) * (
            lr_gamma ** (epoch / T)
        )
        return jnp.maximum(lr, 5e-7)

    return schedule


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--cd-prob", type=float, default=0.6,
                        help="cycle-detection pass probability (:204)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.data.device_pipeline import DevicePipeline
    from litehandnet_tpu.data.loader import DataLoader
    from litehandnet_tpu.eval.result_parser import ResultParser
    from litehandnet_tpu.losses import get_loss
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.train import TrainState, make_mesh, make_train_step
    from litehandnet_tpu.train.checkpoint import CheckpointManager, run_dir
    from litehandnet_tpu.train.distributed import is_chief
    from litehandnet_tpu.utils.logging_ import MetricLogger

    cfg = get_config(args.cfg)
    cfg.MODEL.with_region_map = True
    if cfg.LOSS.type.lower() != "centersimdrloss":
        cfg.LOSS.type = "CenterSimdrLoss"

    n_dev = args.num_devices or jax.local_device_count()
    batch = int(cfg.TRAIN.batch_per_gpu) * n_dev
    loader = DataLoader(cfg, "train", batch_size=batch,
                        num_workers=args.workers, seed=args.seed)
    steps_per_epoch = max(len(loader), 1)

    mesh = make_mesh(n_dev)
    sync_bn = bool(cfg.TRAIN.get("syncBN", False)) and n_dev > 1
    model = get_model(cfg, axis_name="data" if sync_bn else None)
    crit = get_loss(cfg)
    schedule = sine_decay_schedule(
        float(cfg.OPTIMIZER.lr) * n_dev, steps_per_epoch,
        T=int(cfg.OPTIMIZER.get("T", 40)),
        lr_gamma=float(cfg.OPTIMIZER.get("lr_gamma", 0.5)),
    )
    tx = optax.adamw(schedule)
    step_fn = make_train_step(model, crit, tx, mesh)

    # half-resolution pipeline for the cycle-detection pass: GT bboxes become
    # fresh (center, scale) crops
    half_cfg = get_config(args.cfg)
    half_cfg.MODEL.with_region_map = True
    half_cfg.DATASET.image_size = [s // 2 for s in cfg.DATASET.image_size]
    half_cfg.DATASET.heatmap_size = [s // 2 for s in cfg.DATASET.heatmap_size]
    # SimDR supervision stays full-resolution only; the reduced pass trains
    # heatmap/region channels (the reference's stale Gen-1 loss could not
    # have mixed them either)
    half_cfg.PIPELINE.simdr_split_ratio = 0
    cd_pipeline = DevicePipeline(
        half_cfg, loader.dataset.ann_info["flip_index"], is_train=True
    )
    cd_step_fn = None  # separate jit (different spatial shapes)

    sample = next(iter(loader.batches(0)))
    mv = model.init(jax.random.PRNGKey(args.seed),
                    jnp.asarray(sample["img"][:1]), train=False)
    out0 = model.apply(mv, jnp.asarray(sample["img"][:1]), train=False)
    cv = crit.init(jax.random.PRNGKey(args.seed + 1), out0, sample)
    state = TrainState.create(mv, cv, tx)

    directory = run_dir(cfg)
    ckpt = CheckpointManager(directory, cfg)
    logger = MetricLogger(directory, enabled=is_chief())
    parser_ = ResultParser(cfg, cd_enabled=False)

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed + 77)
    total_epochs = int(cfg.TRAIN.get("total_epoches", 10))
    best_pck = 0.0
    train_keys = ("img", "target", "target_weight", "simdr_x", "simdr_y")

    val_loader = None  # built lazily on first eval

    for epoch in range(total_epochs):
        agg, n = {}, 0
        for raw in loader.batches(epoch):
            # distinct keys for the main step, the cd pipeline's
            # augmentation draws, and the cd step's dropout
            key, k1, k2, k3 = jax.random.split(key, 4)
            batch_main = {k: raw[k] for k in train_keys if k in raw}
            state, metrics = step_fn(state, batch_main, k1)
            n += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)

            if rng.rand() < args.cd_prob:
                # cycle-detection pass: re-crop GT bboxes at half size.
                # img_raw is in CANVAS coords (the loader may have
                # ROI-shifted/downscaled the source), so derive the fresh
                # (center, scale) from bbox_canvas and use joints_canvas.
                bbox = np.asarray(raw["bbox_canvas"])
                centers = bbox[:, :2] + bbox[:, 2:] / 2.0
                sides = np.maximum(bbox[:, 2:3], bbox[:, 3:4])
                scales = np.concatenate([sides, sides], axis=1) / 200.0 * 1.3
                cd_batch = cd_pipeline(
                    _raw_images(raw),
                    np.asarray(raw["joints_canvas"]),
                    np.asarray(raw["vis_src"]),
                    centers, scales, np.zeros(len(bbox), np.float32), k2,
                    bboxes=bbox,
                )
                if cd_step_fn is None:
                    cd_step_fn = make_train_step(model, crit, tx, mesh)
                cd_train = {
                    k: cd_batch[k] for k in train_keys if k in cd_batch
                }
                state, cd_metrics = cd_step_fn(state, cd_train, k3)
                agg["cd_loss"] = agg.get("cd_loss", 0.0) + float(
                    cd_metrics["loss"]
                )
        agg = {k: v / max(n, 1) for k, v in agg.items()}
        logger.log(epoch, agg, prefix="train/")
        eval_interval = int(cfg.EVAL.get("interval", 1) or 1)
        # reference cadence: epoch % eval_interval == 0 (run() loop,
        # train_distributed_center_simdr_freihand.py:341-343)
        if is_chief() and epoch % eval_interval == 0:
            if val_loader is None:
                val_loader = DataLoader(
                    cfg, "val", batch_size=batch, num_workers=args.workers,
                    seed=args.seed, drop_last=False,
                )
            # reference test() reports coord PCK + heatmap PCK + region AP
            metrics = evaluate_multihand_pck(
                model, state, val_loader, parser_, full_metrics=True
            )
            pck = metrics["coor_pck"]
            logger.log(epoch, {"pck": pck, **metrics}, prefix="val/")
            # reference gates the best checkpoint on an improved PCK
            # (save_model, train_distributed_center_simdr_freihand.py:304-329;
            # its absolute >85 floor only matters at convergence)
            if pck > best_pck:
                best_pck = pck
                ckpt.save(state, epoch, best=True)
        if is_chief():
            print(f"epoch {epoch}: {agg} best_pck={best_pck:.4f}", flush=True)
            ckpt.save(state, epoch, best=False)
    logger.close()
    loader.close()
    if val_loader is not None:
        val_loader.close()
    return state


def evaluate_multihand_pck(model, state, loader, parser_, max_batches=50,
                           full_metrics=False):
    """Reference Gen-1 test() (:240-278): bboxes decoded from the last
    stack's region maps, per-bbox keypoint extraction, multi-hand
    coordinate PCK vs ground truth — all in crop space.

    With ``full_metrics=True`` also reports the reference test()'s other
    two metrics — heatmap-space PCK per stack and region-map AP — keyed
    CORRECTLY (the reference's own calls at
    train_distributed_center_simdr_freihand.py:260,265 pass the keypoint
    channels to evaluate_ap and misplace evaluate_pck's positional args;
    see PARITY.md)."""
    import jax.numpy as jnp

    from litehandnet_tpu.eval.legacy_eval import evaluate_ap, heatmap_pck

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    image_size = parser_.image_size[0]
    pcks, hm_pcks, ap50s, aps = [], [], [], []
    for bi, raw in enumerate(loader.batches(0)):
        if bi >= max_batches:
            break
        out = model.apply(variables, jnp.asarray(raw["img"]), train=False)
        hm_list = out[0] if isinstance(out, tuple) else out
        hm = np.asarray(hm_list[-1])
        # crop-space GT bbox as cxcywh, [B, 1, 4] — shared by the AP eval,
        # heatmap PCK, and the multi-hand coordinate PCK below.
        # raw["bbox"] is source-image coords, the wrong frame for crop space.
        bb = np.asarray(raw["bbox_crop"])         # [B, 4] xywh crop coords
        gt_boxes = np.stack(
            [bb[:, 0] + bb[:, 2] / 2, bb[:, 1] + bb[:, 3] / 2,
             bb[:, 2], bb[:, 3]], axis=-1,
        )[:, None]                                # [B, 1, 4] cxcywh
        if full_metrics:
            # Scale bridge: this trainer supervises wh as ratios w/img
            # (this repo's uniform convention; the device pipeline paints
            # them over the Gen-1 +-3*sigma patch, see ops/encode.region_map
            # patch="gen1"), but evaluate_ap decodes the Gen-1 SCALE
            # (gamma = w*hm/img, data/handset/dataset_function.py:193,
            # scaled back by the feature stride in _get_wh). ratio * hm ==
            # Gen-1 gamma exactly, so scale the wh channels before handing
            # them to the Gen-1 decoder — without this every candidate is
            # ~0 px wide and AP is structurally zero.
            region = hm[..., -3:].copy()
            region[..., 1:] *= np.array(hm.shape[1:3][::-1], np.float32)
            ap50, ap, _ = evaluate_ap(
                region, gt_boxes.tolist(), image_size
            )
            ap50s.append(ap50)
            aps.append(ap)
            tgt = np.asarray(raw["target"])
            if tgt.ndim == 5:  # stacked [B, S, H, W, C]
                tgt = tgt[:, -1]
            n_kpt = hm.shape[-1] - 3
            tw = np.asarray(raw["target_weight"])[:, :n_kpt, None]
            hm_pcks.append(heatmap_pck(
                hm[..., :n_kpt], tgt[..., :n_kpt], gt_boxes,
                image_size=image_size, target_weight=tw,
            ))
        boxes = parser_.get_pred_bbox(hm[..., -3:])
        kpts = parser_.get_group_keypoints(
            np.asarray(raw["img"]), hm[..., :-3], boxes
        )
        gt_j = np.asarray(raw["joints"])          # [B, K, 2] crop coords
        gt_vis = np.asarray(raw["target_weight"])[:, : gt_j.shape[1]]
        gt_kpts = np.concatenate(
            [gt_j, gt_vis[..., None]], axis=-1
        )[:, None]                                # [B, 1, K, 3] single hand
        pcks.append(parser_.evaluate_pck(kpts, gt_kpts, gt_boxes))
    coor_pck = float(np.mean(pcks)) if pcks else 0.0
    if full_metrics:
        return dict(
            coor_pck=coor_pck,
            hm_pck=float(np.mean(hm_pcks)) if hm_pcks else 0.0,
            ap50=float(np.mean(ap50s)) if ap50s else 0.0,
            ap=float(np.mean(aps)) if aps else 0.0,
        )
    return coor_pck


def _raw_images(raw):
    """The loader's raw uint8 canvases (kept when use_device_pipeline=True
    is off). Falls back to de-normalizing the processed crop."""
    if "img_raw" in raw:
        return np.asarray(raw["img_raw"])
    img = np.asarray(raw["img"])
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return ((img * std + mean) * 255.0).clip(0, 255).astype(np.uint8)


if __name__ == "__main__":
    main()
