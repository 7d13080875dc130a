#!/usr/bin/env python
"""End-to-end inference benchmark: preprocess + LiteHandNet forward + DARK
decode, images/sec/chip on the flagship model at 256x256.

Prints ONE JSON line:
    {"metric": "e2e_images_per_sec_per_chip", "num_chips": N_DEV,
     "value": N, "unit": "img/s", "vs_baseline": N / 5000}

vs_baseline is relative to the 5,000 img/s/chip north star
(BASELINE.json; the PyTorch reference runs the same pipeline at 15.7 FPS
batch-1 on the author's GPU, BASELINE.md §B).

Method: M distinct uint8 batches are pre-staged in HBM; one jitted program
loops over them doing uint8->float normalize -> bf16 deploy-fused forward ->
f32 DARK(unbiased, k=11) decode -> coords, accumulating decoded coordinates
so no iteration can be elided. Wall time is measured around full host-side
materialization of the result (the remote-TPU tunnel's async dispatch makes
`block_until_ready` unreliable for timing; np.asarray is not).
"""

import json
import time

import numpy as np


def _spread(rates):
    """Median + min/max over per-rep rates. Single-shot numbers hid a 2.3x
    swing between rounds (217 vs 96 img/s from_disk, VERDICT r4 Weak #5);
    the spread makes rig noise visible in the artifact itself."""
    rates = sorted(float(r) for r in rates)
    return {
        "median": round(float(np.median(rates)), 1),
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
        "n": len(rates),
    }


def _ensure_jpeg_dataset(SIZE, N):
    """Synthesize an on-disk JPEG dataset once (centered hand bbox; source
    images larger than the crop so the decode path is exercised fully).
    Returns (root, ann_path)."""
    import os
    import tempfile

    from PIL import Image

    root = os.path.join(tempfile.gettempdir(), f"lhn_bench_ds_{SIZE}_{N}")
    ann_path = os.path.join(root, "ann.json")
    if not os.path.exists(ann_path):
        os.makedirs(os.path.join(root, "images"), exist_ok=True)
        rng = np.random.RandomState(0)
        images, annotations = [], []
        for i in range(N):
            arr = rng.randint(0, 255, (320, 320, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(root, f"images/{i:06d}.jpg"), quality=90
            )
            images.append(dict(id=i, file_name=f"images/{i:06d}.jpg",
                               width=320, height=320))
            kpts = []
            for x, y in rng.uniform(60, 260, (21, 2)):
                kpts += [float(x), float(y), 1]
            annotations.append(dict(
                id=i, image_id=i, category_id=1, iscrowd=0, keypoints=kpts,
                bbox=[40.0, 40.0, 240.0, 240.0], area=240.0 * 240.0,
            ))
        with open(ann_path, "w") as f:
            json.dump(dict(images=images, annotations=annotations,
                           categories=[dict(id=1, name="hand")]), f)
    return root, ann_path


def real_input_bench(n_images=None, batch=None, quiet=False, repeats=3):
    """Disk-to-coordinates serving benchmark: JPEG decode (thread pool,
    double-buffered prefetch) -> fused DevicePipeline -> bf16 deploy-fused
    forward -> DARK decode -> host coords. Measures the FULL input path the
    default mode pre-stages away (BASELINE.json's metric is
    'pre+infer+decode end-to-end'; SURVEY §7 predicted host decode as the
    real bottleneck)."""
    import os

    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.data.loader import DataLoader
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.ops.decode import keypoints_from_heatmaps

    n_dev = jax.local_device_count()
    SIZE = 256
    B = (batch or int(os.environ.get("LHN_BENCH_B", 128))) * n_dev
    N = n_images or int(os.environ.get("LHN_BENCH_N", 4096))

    root, ann_path = _ensure_jpeg_dataset(SIZE, N)

    cfg = config_from_dict(dict(
        MODEL=dict(name="litehandnet", num_stage=4, num_block=[2, 2, 2],
                   input_channel=128, ca_type="ca", reduction=4,
                   activation="leakyrelu", output_channel=21),
        DATASET=dict(
            name="freihand", num_joints=21, image_size=[SIZE, SIZE],
            heatmap_size=[SIZE // 4, SIZE // 4],
            test=dict(ann_file=ann_path, img_prefix=root + "/"),
        ),
        PIPELINE=dict(flip_prob=0, rot_prob=0, rot_factor=0, scale_factor=0,
                      use_udp=False, sigma=2, encoding="MSRA",
                      unbiased_encoding=True),
        TRAIN=dict(batch_per_gpu=B // n_dev),
        EVAL=dict(metric=["PCK"]),
    ))
    model = get_model(cfg, deploy=True, dtype=jnp.bfloat16)
    small = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(k, small, train=False))(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def fwd_decode(v, img, center, scale):
        hm = model.apply(v, img.astype(jnp.bfloat16), train=False)
        _, preds, maxvals = keypoints_from_heatmaps(
            hm, center, scale, post_process="unbiased", kernel=11
        )
        return preds, maxvals

    # tight canvas = exactly the crop size: the ROI window is cut (and if
    # needed downscaled) at decode time, minimizing host->device bytes —
    # on this rig the tunnel (~22 MB/s effective) and the single host core
    # (~660 img/s cv2 JPEG decode) are the binding constraints, not TPU
    # compute (13.2k img/s device-resident)
    loader = DataLoader(cfg, "test", batch_size=B, num_workers=16,
                        canvas_hw=(SIZE, SIZE), drop_last=True)

    def run_epoch(epoch):
        n_imgs = 0
        last = None
        t_start = None
        for bi, b in enumerate(loader.batches(epoch)):
            preds, maxvals = fwd_decode(
                variables, b["img"], b["center"], b["scale"]
            )
            last = (preds, maxvals)
            if bi <= 1:
                # first two batches carry compile + cache warmup; start the
                # clock after materializing them, and keep them OUT of the
                # image count (their work predates t_start)
                if bi == 1:
                    np.asarray(last[0])
                    t_start = time.time()
                continue
            n_imgs += B
        coords = np.asarray(last[0])  # full host materialization = sync
        assert np.isfinite(coords).all()
        if t_start is None:
            return 0.0
        return n_imgs / (time.time() - t_start) / n_dev

    # >=3 epoch repeats over the SAME staged dataset (disk pages warm after
    # epoch 0, compile warm after the first two batches) so the artifact
    # carries a spread, not a single draw
    rates = [run_epoch(e) for e in range(repeats)]
    if not quiet:
        print(json.dumps({
            "metric": "real_input_images_per_sec_per_chip",
            "num_chips": n_dev,
            "value": _spread(rates)["median"],
            "spread": _spread(rates),
            "unit": "img/s",
            "vs_baseline": round(_spread(rates)["median"] / 5000.0, 3),
        }))
    return rates


def input_budget_bench(n_images=1024, quiet=False):
    """Per-stage input-path budget: measure each stage of disk->coords in
    isolation, then print the arithmetic from this host to the 5k img/s/chip
    from-disk target (PROFILE.md "input budget"). Stages:

      decode (per worker):   JPEG -> ROI canvas, native libjpeg / cv2 pool /
                             N-process shared-memory pool (data/mp_decode.py)
      transfer:              canvas host -> device bytes/s
      device:                uint8 -> coords compute rate (device-resident)

    The from-disk rate is min(decode x workers, transfer, device) when the
    stages overlap; `--real-input` measures the actual overlap."""
    import os

    # the stage loops slice paths[(r*B) % (n_images - B):][:B] — distinct
    # per-rep offsets need n_images - B to not divide r*B (at exactly 2B
    # every rep would re-read the same warm-cache batch)
    assert n_images > 256, "need > 2 batches (B=128) of distinct images"

    import jax
    import jax.numpy as jnp

    from litehandnet_tpu import native
    from litehandnet_tpu.data.loader import _load_image
    from litehandnet_tpu.data.mp_decode import ProcessDecodePool, default_procs

    SIZE, B = 256, 128
    root, ann_path = _ensure_jpeg_dataset(SIZE, n_images)
    paths = [os.path.join(root, f"images/{i:06d}.jpg")
             for i in range(n_images)]
    centers = np.tile(np.float32([160.0, 160.0]), (B, 1))
    halves = np.full(B, 176.0, np.float32)  # 240-px box * 1.1 margin * 1.05
    scales = np.tile(np.float32([240.0 / 200, 240.0 / 200]), (B, 1))
    canvas = (SIZE, SIZE)
    stages = {}
    spreads = {}

    def rate(fn, tag, reps):
        fn(0)  # warm (page cache, pools)
        per_rep = []
        for r in range(1, reps + 1):
            t0 = time.time()
            fn(r)
            per_rep.append(B / (time.time() - t0))
        sp = _spread(per_rep)
        stages[tag] = sp["median"]
        spreads[tag] = sp

    reps = max(n_images // B - 1, 2)
    if native.available():
        nt = os.cpu_count() or 1
        rate(lambda r: native.decode_roi_batch(
            paths[(r * B) % (n_images - B):][:B], canvas, centers, halves,
            n_threads=1), "decode_native_1thread_img_per_s", reps)
        if nt > 1:
            rate(lambda r: native.decode_roi_batch(
                paths[(r * B) % (n_images - B):][:B], canvas, centers,
                halves, n_threads=nt),
                f"decode_native_{nt}threads_img_per_s", reps)
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(8) as pool:
        rate(lambda r: list(pool.map(
            lambda p: _load_image(p, canvas, center=centers[0],
                                  scale=scales[0], margin=1.1),
            paths[(r * B) % (n_images - B):][:B])),
            "decode_cv2_pool_img_per_s", reps)
    nproc = default_procs()
    mp_pool = ProcessDecodePool(nproc, B, canvas, roi_margin=1.1)
    try:
        rate(lambda r: mp_pool.decode(
            paths[(r * B) % (n_images - B):][:B], centers, scales),
            f"decode_mp_{nproc}procs_img_per_s", reps)
    finally:
        mp_pool.close()

    # host -> device transfer rate (uint8 canvases; sync via materialize).
    # Two pre-built buffers alternated for distinct content: building the
    # perturbed array INSIDE the timed loop is a full 25 MB host-side numpy
    # materialization (several ms) that would understate PCIe bandwidth 2-4x
    bufs = [
        np.random.RandomState(s).randint(0, 256, (B, SIZE, SIZE, 3), np.uint8)
        for s in (0, 1)
    ]
    sums = []

    def xfer(r):
        dev = jax.device_put(bufs[r % 2])  # distinct content per rep
        sums.append(float(jnp.sum(dev[0, 0, 0])))

    rate(xfer, "transfer_img_per_s", 4)
    bytes_per_img = SIZE * SIZE * 3
    stages["transfer_MB_per_s"] = round(
        stages["transfer_img_per_s"] * bytes_per_img / 1e6, 1
    )

    # budget arithmetic toward the 5k img/s/chip from-disk target.
    # Per-CORE rate: the native measurement is genuinely 1-thread; the cv2
    # pool runs 8 threads (cv2 releases the GIL), so on a multi-core host
    # its aggregate rate must be divided by the cores it actually used —
    # treating it as per-core would overstate decode capacity up to 8x.
    cv2_pool_cores = min(8, os.cpu_count() or 1)
    per_core = max(
        stages.get("decode_native_1thread_img_per_s", 0.0),
        stages.get("decode_cv2_pool_img_per_s", 0.0) / cv2_pool_cores,
    )
    stages["decode_per_core_img_per_s"] = round(per_core, 1)
    budget = {
        "bytes_per_img": bytes_per_img,
        "decode_cores_needed_for_5k": round(5000.0 / max(per_core, 1e-9), 1),
        "transfer_MBps_needed_for_5k": round(5000 * bytes_per_img / 1e6, 1),
        "host_cores": os.cpu_count(),
    }
    if not quiet:
        print(json.dumps({"metric": "input_budget", "stages": stages,
                          "spread": spreads, "budget": budget}))
    return stages, budget, spreads


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.train.distributed import make_mesh

    from litehandnet_tpu.ops.decode import keypoints_from_heatmaps

    import os

    n_dev = jax.local_device_count()
    # 128/chip was the best of the measured sweep; env overrides support
    # quick validation runs (e.g. on the virtual CPU mesh)
    B = int(os.environ.get("LHN_BENCH_B", 128)) * n_dev
    # more pre-staged batches amortize the host sync per measurement rep
    # (measured on v5e: M=8 -> 7.6k, M=16 -> 8.2k, M=32 -> 9.2k, M=64 ->
    # 9.6k, M=128 -> 9.8k img/s); 64 balances HBM use vs accuracy
    M = int(os.environ.get("LHN_BENCH_M", 64))
    # the whole pipeline shards over a 1-D data mesh: with >1 chip the batch
    # splits across ICI and throughput scales; per-chip rate is reported.
    SIZE = 256
    cfg = config_from_dict(
        dict(
            MODEL=dict(
                name="litehandnet", num_stage=4, num_block=[2, 2, 2],
                input_channel=128, ca_type="ca", reduction=4,
                activation="leakyrelu", output_channel=21,
            ),
            DATASET=dict(
                num_joints=21, image_size=[SIZE, SIZE],
                heatmap_size=[SIZE // 4, SIZE // 4],
            ),
        )
    )
    model = get_model(cfg, deploy=True, dtype=jnp.bfloat16)

    # init at a small spatial size (conv params are spatial-size agnostic)
    # to keep the one-off init compile cheap over the TPU tunnel.
    small = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(k, small, train=False))(
        jax.random.PRNGKey(0)
    )

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0
    center = jnp.tile(jnp.float32([SIZE / 2, SIZE / 2]), (B, 1))
    scale = jnp.tile(jnp.float32([SIZE / 200.0, SIZE / 200.0]), (B, 1))

    def one_step(v, raw_u8, bump):
        img = (raw_u8.astype(jnp.float32) - mean) / std      # preprocess
        hm = model.apply(v, img.astype(jnp.bfloat16), train=False)
        _, preds, maxvals = keypoints_from_heatmaps(         # decode (DARK)
            # nano-perturbed center keeps every call's arguments AND
            # computation distinct at zero measurable cost
            hm, center + bump * 1e-9, scale, post_process="unbiased",
            kernel=11,
        )
        return preds, maxvals

    @jax.jit
    def pipeline(v, stack, bump):
        # `bump` makes every call's arguments distinct: identical repeated
        # calls can be served from the tunnel's remote execution cache and
        # time as a no-op (PROFILE.md).
        def body(i, acc):
            preds, maxvals = one_step(v, stack[i], bump)
            return acc + preds.sum() + maxvals.sum()
        return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

    mesh = make_mesh(n_dev)
    batch_sharding = NamedSharding(mesh, P(None, "data"))
    replicated = NamedSharding(mesh, P())
    rng = np.random.RandomState(0)
    stack = jax.device_put(
        jnp.asarray(
            rng.randint(0, 256, size=(M, B, SIZE, SIZE, 3), dtype=np.uint8)
        ),
        batch_sharding,
    )
    variables = jax.device_put(variables, replicated)

    # compile + warm (first run of a fresh executable is up to ~4x
    # steady state, PROFILE.md)
    for w in range(2):
        float(pipeline(variables, stack, jnp.float32(100 + w)))

    reps = 5
    rates = []
    for r in range(reps):
        # materialize = sync; distinct bump per rep defeats the exec cache
        t0 = time.time()
        result = float(pipeline(variables, stack, jnp.float32(r)))
        rates.append(M * B / (time.time() - t0) / n_dev)  # per chip
        assert np.isfinite(result)
    return rates, n_dev


def combined():
    """The honest end-to-end report, ONE JSON line with BOTH modes:

    - `value`: device-resident headline (uint8 batches pre-staged in HBM —
      preprocess + forward + DARK decode, what the chip sustains when the
      input system keeps up);
    - `from_disk`: the same pipeline fed by the real input path (JPEG on
      disk -> ROI decode -> H2D -> device), the metric BASELINE.json
      defines ('pre+infer+decode end-to-end', reference path
      datasets/data_pipeline/loading.py:6-89);
    - `input_budget`: measured per-stage rates (decode img/s/core, H2D
      MB/s) on THIS host;
    - `projection_tpu_host`: arithmetic from those measured rates to a
      real TPU-VM host (the from-disk number here is bound by this rig's
      1 CPU core + ~22 MB/s tunnel, not by the TPU)."""
    import os

    head_rates, n_dev = main()
    head = _spread(head_rates)
    value = head["median"]
    disk_rates = real_input_bench(quiet=True)
    disk = _spread(disk_rates)
    from_disk = disk["median"]
    stages, budget, spreads = input_budget_bench(quiet=True)

    # per-CORE decode rate from input_budget_bench (the cv2 pool's 8-thread
    # aggregate is divided by the cores it used there — see that function)
    per_core = stages.get("decode_per_core_img_per_s", 0.0)
    # v5e host: 112 vCPUs / 8 chips = 14 cores/chip (public v5e-8 shape),
    # PCIe gen3 x8 per chip >> the 0.2 GB/s 5k img/s needs
    host_cores_per_chip = int(os.environ.get("LHN_HOST_CORES_PER_CHIP", 14))
    decode_capacity = per_core * host_cores_per_chip
    projected = min(decode_capacity, value)
    projection = {
        "decode_img_per_s_per_core_measured": round(per_core, 1),
        "host_cores_per_chip_assumed": host_cores_per_chip,
        "decode_capacity_img_per_s": round(decode_capacity, 1),
        "device_rate_img_per_s": round(value, 1),
        "projected_from_disk_img_per_s_per_chip": round(projected, 1),
        "meets_5k_north_star": bool(projected >= 5000.0),
    }
    print(json.dumps({
        "metric": "e2e_images_per_sec_per_chip",
        "num_chips": n_dev,
        "value": round(value, 1),
        "spread": head,
        "unit": "img/s",
        "vs_baseline": round(value / 5000.0, 3),
        "from_disk": {
            "metric": "real_input_images_per_sec_per_chip",
            "value": round(from_disk, 1),
            "spread": disk,
            "vs_baseline": round(from_disk / 5000.0, 3),
            "bound_by": "this rig's 1-core host + ~22 MB/s TPU tunnel",
        },
        "input_budget": {"stages": stages, "spread": spreads,
                         "budget": budget},
        "projection_tpu_host": projection,
    }))


if __name__ == "__main__":
    import sys

    if "--input-budget" in sys.argv:
        input_budget_bench()
    elif "--real-input" in sys.argv:
        real_input_bench()
    elif "--headline-only" in sys.argv:
        rates, n_dev = main()
        sp = _spread(rates)
        print(json.dumps({
            "metric": "e2e_images_per_sec_per_chip", "num_chips": n_dev,
            "value": sp["median"], "spread": sp, "unit": "img/s",
            "vs_baseline": round(sp["median"] / 5000.0, 3),
        }))
    else:
        combined()
