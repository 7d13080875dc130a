"""Image/video demo — the reference `test/video_demo.py` equivalent.

Usage:
    python -m litehandnet_tpu.tools.demo --cfg <config> \
        --inputs img1.jpg img2.jpg --out-dir demo_out/

Runs the multi-hand pipeline on images (or video frames when cv2 is
available): region-map bbox detection -> per-bbox keypoints (with cycle
detection) -> skeleton rendering.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="litehandnet_tpu demo")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--inputs", nargs="+", required=True,
                        help="image files or a single video file")
    parser.add_argument("--out-dir", default="demo_out")
    parser.add_argument("--load-best", action="store_true")
    parser.add_argument(
        "--pyramid", action="store_true",
        help="SRHandNet two-stage multi-hand inference on full frames "
             "(reference official_code.py:28-213)",
    )
    parser.add_argument("--max-hands", type=int, default=4)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from litehandnet_tpu.config import get_config
    from litehandnet_tpu.data.dataset_info import DATASET_INFOS, DatasetInfo
    from litehandnet_tpu.eval.decoder import TopDownDecoder
    from litehandnet_tpu.eval.result_parser import ResultParser
    from litehandnet_tpu.models import fuse_params, get_model
    from litehandnet_tpu.train.checkpoint import CheckpointManager, run_dir
    from litehandnet_tpu.utils.vis import draw_bbox, draw_keypoints

    cfg = get_config(args.cfg)
    os.makedirs(args.out_dir, exist_ok=True)
    W, H = (int(v) for v in cfg.DATASET.image_size)
    info = DatasetInfo(DATASET_INFOS[cfg.DATASET.name.lower()])

    model = get_model(cfg)
    x0 = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    # load the trained run for this config, like tools/test.py (reference
    # test.py:77-99); a raw restore so the demo doesn't need to rebuild the
    # training run's criterion/optimizer/scaler tree
    saved, _ = CheckpointManager(run_dir(cfg), cfg, read_only=True).restore_raw(
        best=args.load_best)
    if saved is None:
        print("no checkpoint found; running random init", flush=True)
    else:
        variables = {"params": saved["params"]}
        if saved.get("batch_stats"):
            variables["batch_stats"] = saved["batch_stats"]
    if cfg.MODEL.name.lower() == "litehandnet":
        # deploy-mode fusion (reference test.py:106-107)
        model = get_model(cfg, deploy=True)
        variables = fuse_params(variables)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with_region = cfg.MODEL.get("pred_bbox", False) or cfg.MODEL.get(
        "with_region_map", False
    )
    decoder = TopDownDecoder(cfg)
    # pcfg.max_num_bbox mirrors the reference's single-hand default (1);
    # the demo drives multi-hand scenes, so --max-hands raises the cap here
    parser_ = (
        ResultParser(cfg, max_num_bbox=args.max_hands) if with_region else None
    )

    def iter_frames():
        """Yield (tag, RGB frame) from image files or a video (when cv2 is
        importable, mirroring test/video_demo.py)."""
        for path in args.inputs:
            if path.lower().endswith((".mp4", ".avi", ".mov", ".mkv")):
                import cv2

                cap = cv2.VideoCapture(path)
                n = 0
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    yield f"{os.path.basename(path)}_{n:05d}.jpg", frame[..., ::-1]
                    n += 1
                cap.release()
            else:
                yield os.path.basename(path), np.asarray(
                    Image.open(path).convert("RGB")
                )

    pyramid = None
    if args.pyramid:
        from litehandnet_tpu.eval.srhandnet_pyramid import SRHandNetPyramid

        assert cfg.MODEL.name.lower() == "srhandnet", \
            "--pyramid is the SRHandNet official demo path"
        pyramid = SRHandNetPyramid(
            model, variables, input_hw=(H, W), max_hands=args.max_hands,
            num_joints=info.keypoint_num,
        )

    for tag, frame in iter_frames():
        if pyramid is not None:
            coords, found, rects, hand_valid = pyramid(frame)
            vis = frame
            valid_rects = rects[hand_valid]
            if len(valid_rects):
                # xywh (top-left) -> cxcywh for draw_bbox
                cboxes = valid_rects.copy()
                cboxes[:, 0] += cboxes[:, 2] / 2
                cboxes[:, 1] += cboxes[:, 3] / 2
                vis = draw_bbox(
                    vis, np.concatenate(
                        [cboxes, np.ones((len(cboxes), 1))], axis=1
                    ),
                )
            for hi in np.where(hand_valid)[0]:
                hand = np.concatenate(
                    [coords[hi], found[hi][:, None].astype(np.float32)],
                    axis=1,
                )
                vis = draw_keypoints(
                    vis, hand, info.skeleton, info.pose_kpt_color,
                    info.pose_link_color,
                )
            out_path = os.path.join(args.out_dir, tag)
            Image.fromarray(np.asarray(vis, np.uint8)).save(out_path)
            print(f"wrote {out_path}", flush=True)
            continue
        img = np.asarray(Image.fromarray(frame).resize((W, H)))
        inp = ((img / 255.0 - mean) / std).astype(np.float32)[None]
        out = fwd(variables, jnp.asarray(inp))
        if isinstance(out, (tuple, list)):
            out = out[-1] if not isinstance(out[0], (tuple, list)) else out[0][-1]
        out = np.asarray(out, np.float32)

        if with_region and out.shape[-1] >= info.keypoint_num + 3:
            boxes = parser_.get_pred_bbox(out[..., -3:])
            kpts = parser_.get_group_keypoints(inp, out[..., :-3], boxes)
            vis = draw_bbox(img, boxes[0])
            for hand in kpts[0]:
                if hand[:, 2].max() > 0:
                    vis = draw_keypoints(
                        vis, hand, info.skeleton, info.pose_kpt_color,
                        info.pose_link_color,
                    )
        else:
            center = np.array([[W / 2, H / 2]], np.float32)
            scale = np.array([[W / 200.0, H / 200.0]], np.float32)
            res = decoder.decode({"center": center, "scale": scale}, out)
            vis = draw_keypoints(
                img, res["preds"][0], info.skeleton, info.pose_kpt_color,
                info.pose_link_color,
            )
        out_path = os.path.join(args.out_dir, tag)
        Image.fromarray(vis).save(out_path)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
