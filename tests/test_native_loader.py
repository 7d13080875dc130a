"""Native C++ JPEG ROI decoder (litehandnet_tpu/native) vs the Python path.

The native decoder must reproduce data/loader.py::_load_image's geometry
contract bit-for-bit (offset/scale used to remap annotations) and its pixel
content to tolerance (partial/DCT-scaled decode differ at chroma-upsampling
block edges only). Covers the reference's full-image decode semantics
(datasets/data_pipeline/loading.py:6-89) under all three canvas regimes.
"""

import json
import os

import numpy as np
import pytest

from litehandnet_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder unavailable (no g++/libjpeg)"
)


@pytest.fixture(scope="module")
def imgdir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("native_imgs")
    rng = np.random.RandomState(7)

    def smooth(w, h):
        base = rng.randint(0, 255, (32, 32, 3), np.uint8)
        return np.asarray(
            Image.fromarray(base).resize((w, h), Image.BILINEAR), np.uint8
        )

    Image.fromarray(smooth(300, 260)).save(d / "small.jpg", quality=92)
    Image.fromarray(smooth(1280, 960)).save(d / "big.jpg", quality=92)
    Image.fromarray(smooth(640, 480)).save(d / "mid.png")
    Image.fromarray(smooth(200, 200)).convert("L").save(
        d / "gray.jpg", quality=92
    )
    return d


def run_both(path, canvas_hw, center, scale, margin=1.0):
    from litehandnet_tpu.data.loader import _load_image

    ref, roff, rsc = _load_image(
        str(path), canvas_hw, center=center, scale=scale, margin=margin
    )
    if center is None:
        centers, halves = np.zeros((1, 2), np.float32), np.float32([-1.0])
    else:
        wxy = np.asarray(scale, np.float32) * 200.0 * margin
        half = float(np.hypot(wxy[0], wxy[1])) / 2.0 + 4.0
        centers = np.asarray([center], np.float32)
        halves = np.float32([half])
    canv, off, sc, st = native.decode_roi_batch(
        [str(path)], canvas_hw, centers, halves, n_threads=2
    )
    return (ref, roff, rsc), (canv[0], off[0], sc[0], st[0])


def test_direct_fit_exact(imgdir):
    """Source smaller than the canvas: full decode, bit-exact vs PIL."""
    (ref, roff, rsc), (nat, off, sc, st) = run_both(
        imgdir / "small.jpg", (512, 512), None, None
    )
    assert st == 0
    np.testing.assert_array_equal(off, roff)
    np.testing.assert_array_equal(sc, rsc)
    np.testing.assert_array_equal(nat, ref)


def test_roi_crop(imgdir):
    """Oversized source with a far-corner bbox: partial-decode ROI window."""
    (ref, roff, rsc), (nat, off, sc, st) = run_both(
        imgdir / "big.jpg", (512, 512),
        center=np.float32([900, 700]), scale=np.float32([1.2, 1.2]),
    )
    assert st == 0
    np.testing.assert_array_equal(off, roff)
    np.testing.assert_array_equal(sc, rsc)
    assert (off > 0).all()  # the ROI actually engaged
    d = np.abs(nat.astype(int) - ref.astype(int))
    assert d.max() <= 8 and d.mean() < 0.1  # chroma block edges only
    assert nat.sum() > 0


def test_full_downscale(imgdir):
    """Whole oversized frame: DCT-scaled decode + fine resize to fit."""
    (ref, roff, rsc), (nat, off, sc, st) = run_both(
        imgdir / "big.jpg", (512, 512),
        center=np.float32([640, 480]), scale=np.float32([10.0, 10.0]),
    )
    assert st == 0
    np.testing.assert_array_equal(off, roff)
    np.testing.assert_array_equal(sc, rsc)
    assert sc[0] < 1.0
    # two-stage resample vs cv2 single-stage: tolerance on content
    d = np.abs(nat.astype(np.float32) - ref.astype(np.float32))
    assert d.mean() < 3.0
    assert np.corrcoef(
        nat.reshape(-1).astype(np.float32), ref.reshape(-1).astype(np.float32)
    )[0, 1] > 0.98


def test_direct_spill_not_double_shifted(imgdir):
    """Direct path with iMCU spill: full-scale ROI fits the canvas but the
    alignment-widened crop (srw) exceeds the canvas width and x0 is not
    iMCU-aligned. Regression: spill rows were shifted during the scanline
    copy AND again by the post-loop fixup, displacing pixels left by the
    alignment offset (up to 15 px) with status 0."""
    # ROI x-window [5, 67): x0=5 is not a multiple of the 8/16-px iMCU
    # width, rw=62 fits the 64-px canvas, but the aligned crop [0, 80)
    # spills past it
    half_target = 31.0
    wx = (half_target - 4.0) * 2.0 / np.sqrt(2.0)
    scale = np.float32([wx / 200.0, wx / 200.0])
    (ref, roff, rsc), (nat, off, sc, st) = run_both(
        imgdir / "small.jpg", (64, 64),
        center=np.float32([36, 50]), scale=scale,
    )
    assert st == 0
    np.testing.assert_array_equal(off, roff)
    np.testing.assert_array_equal(sc, rsc)
    assert off[0] % 8 != 0  # misaligned x0 — the case under test
    d = np.abs(nat.astype(int) - ref.astype(int))
    assert d.max() <= 8 and d.mean() < 0.1


def test_grayscale_jpeg(imgdir):
    """Grayscale JPEGs decode natively (libjpeg converts to RGB)."""
    (ref, roff, rsc), (nat, off, sc, st) = run_both(
        imgdir / "gray.jpg", (512, 512), None, None
    )
    assert st == 0
    d = np.abs(nat.astype(int) - ref.astype(int))
    assert d.max() <= 2


def test_png_falls_back(imgdir):
    """Non-JPEG inputs report a nonzero status for the Python fallback."""
    canv, off, sc, st = native.decode_roi_batch(
        [str(imgdir / "mid.png")], (512, 512),
        np.zeros((1, 2), np.float32), np.float32([-1.0]),
    )
    assert st[0] != 0


def test_dataloader_native_matches_python(imgdir, tmp_path):
    """End-to-end: DataLoader(use_native=True) and (False) produce the same
    batch geometry and tolerance-equal canvases on a mixed jpg/png dataset."""
    from PIL import Image

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.data.loader import DataLoader

    rng = np.random.RandomState(3)
    images, annotations = [], []
    for i in range(8):
        w, h = (640, 480) if i % 2 else (320, 320)
        ext = "png" if i == 5 else "jpg"
        base = rng.randint(0, 255, (24, 24, 3), np.uint8)
        arr = np.asarray(
            Image.fromarray(base).resize((w, h), Image.BILINEAR), np.uint8
        )
        fn = f"{i:03d}.{ext}"
        Image.fromarray(arr).save(tmp_path / fn, **(
            dict(quality=92) if ext == "jpg" else {}
        ))
        images.append(dict(id=i, file_name=fn, width=w, height=h))
        kpts = []
        for x, y in rng.uniform(0.25, 0.75, (21, 2)) * [w, h]:
            kpts += [float(x), float(y), 1]
        annotations.append(dict(
            id=i, image_id=i, category_id=1, iscrowd=0, keypoints=kpts,
            bbox=[w * 0.2, h * 0.2, w * 0.6, h * 0.6], area=w * h * 0.36,
        ))
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="hand")],
    )))

    cfg = config_from_dict(dict(
        MODEL=dict(name="litehandnet", output_channel=21),
        DATASET=dict(
            name="freihand", num_joints=21, image_size=[256, 256],
            heatmap_size=[64, 64],
            test=dict(ann_file=str(ann), img_prefix=str(tmp_path) + os.sep),
        ),
        PIPELINE=dict(flip_prob=0, rot_prob=0, scale_factor=0, sigma=2,
                      encoding="MSRA"),
        TRAIN=dict(batch_per_gpu=8),
        EVAL=dict(metric=["PCK"]),
    ))

    def grab(use_native):
        loader = DataLoader(
            cfg, "test", batch_size=8, use_device_pipeline=False,
            num_workers=2, drop_last=False, use_native=use_native,
        )
        return next(iter(loader.batches(0, prefetch=0)))

    b_nat, b_py = grab(True), grab(False)
    for k in ("joints_canvas", "center_canvas", "scale_canvas", "offset",
              "img_scale"):
        np.testing.assert_allclose(b_nat[k], b_py[k], rtol=0, atol=1e-5,
                                   err_msg=k)
    d = np.abs(
        b_nat["img_raw"].astype(np.float32) - b_py["img_raw"].astype(np.float32)
    )
    assert d.mean() < 3.0


def test_exif_orientation_stored_pixels(imgdir, tmp_path):
    """EXIF-rotated JPEGs decode in STORED orientation on every path —
    reference semantics: mmcv.imfrombytes -> cv2.imdecode never applies the
    Orientation tag (datasets/data_pipeline/loading.py:38), so annotations
    live in stored-pixel space. cv2 (IMREAD_IGNORE_ORIENTATION), PIL
    (no exif_transpose), and the native libjpeg decoder must all agree."""
    from PIL import Image

    from litehandnet_tpu.data.loader import _decode_image, _load_image

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, (32, 64, 3), np.uint8)  # landscape 64x32
    path = tmp_path / "oriented.jpg"
    im = Image.fromarray(arr)
    exif = im.getexif()
    exif[0x0112] = 6  # display hint: rotate 90 CW — must be IGNORED
    im.save(path, exif=exif, quality=95)

    decoded = _decode_image(str(path))
    assert decoded.shape[:2] == (32, 64)  # stored landscape, NOT rotated

    # the full loader path stays in stored orientation
    canvas, off, fsc = _load_image(str(path), (96, 96))
    assert (canvas[:32, :64] > 0).any()
    assert not canvas[40:, :].any()  # nothing beyond the stored 32-px height

    # and the native batch decoder agrees with the Python path bit-for-bit
    (ref, roff, rsc), (nat, noff, nsc, st) = run_both(
        path, (96, 96), None, None
    )
    assert st == 0
    np.testing.assert_array_equal(noff, roff)
    np.testing.assert_array_equal(nsc, rsc)
    d = np.abs(nat.astype(int) - ref.astype(int))
    assert d.max() <= 2


@pytest.mark.slow
def test_process_decode_pool_matches_inprocess(imgdir):
    """ProcessDecodePool (data/mp_decode.py) must reproduce the in-process
    decode exactly: same canvases, same offset/scale geometry — N spawned
    workers writing slices of one shared-memory block are an implementation
    detail, not a semantic change. Includes the fallback path (PNG) inside
    a worker."""
    from litehandnet_tpu.data.loader import _load_image
    from litehandnet_tpu.data.mp_decode import ProcessDecodePool

    canvas = (128, 128)
    margin = 1.1
    paths = [str(imgdir / n) for n in
             ("small.jpg", "big.jpg", "mid.png", "gray.jpg")]
    centers = np.float32([[150, 130], [640, 480], [320, 240], [100, 100]])
    scales = np.float32([[0.8, 0.7], [2.0, 1.5], [1.0, 1.0], [0.5, 0.5]])

    pool = ProcessDecodePool(2, len(paths), canvas, roi_margin=margin)
    try:
        canv, off, fsc = pool.decode(paths, centers, scales)
        for i, p in enumerate(paths):
            ref, roff, rsc = _load_image(
                p, canvas, center=centers[i], scale=scales[i], margin=margin
            )
            np.testing.assert_allclose(off[i], roff, rtol=1e-6)
            np.testing.assert_allclose(fsc[i], rsc, rtol=1e-6)
            # JPEGs may take the native decoder in the worker (block-edge
            # chroma tolerance); the PNG falls back to the exact cv2 path
            diff = np.abs(canv[i].astype(int) - ref.astype(int))
            assert diff.mean() < 3.0 and (diff > 40).mean() < 0.02, (
                i, diff.mean())
    finally:
        pool.close()


def test_dataloader_decode_procs_matches_inprocess(tmp_path):
    """DataLoader(decode_procs=N) — the tools/train.py --decode-procs path —
    must produce the same batch geometry and tolerance-equal canvases as the
    in-process decode, and close() must release the pool."""
    from PIL import Image

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.data.loader import DataLoader

    rng = np.random.RandomState(5)
    images, annotations = [], []
    for i in range(4):
        w, h = 320, 240
        arr = np.asarray(Image.fromarray(
            rng.randint(0, 255, (24, 24, 3), np.uint8)
        ).resize((w, h), Image.BILINEAR), np.uint8)
        fn = f"p{i:03d}.jpg"
        Image.fromarray(arr).save(tmp_path / fn, quality=92)
        images.append(dict(id=i, file_name=fn, width=w, height=h))
        kpts = []
        for x, y in rng.uniform(0.25, 0.75, (21, 2)) * [w, h]:
            kpts += [float(x), float(y), 1]
        annotations.append(dict(
            id=i, image_id=i, category_id=1, iscrowd=0, keypoints=kpts,
            bbox=[w * 0.2, h * 0.2, w * 0.6, h * 0.6], area=w * h * 0.36,
        ))
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="hand")],
    )))

    cfg = config_from_dict(dict(
        MODEL=dict(name="litehandnet", output_channel=21),
        DATASET=dict(
            name="freihand", num_joints=21, image_size=[128, 128],
            heatmap_size=[32, 32],
            test=dict(ann_file=str(ann), img_prefix=str(tmp_path) + os.sep),
        ),
        PIPELINE=dict(flip_prob=0, rot_prob=0, scale_factor=0, sigma=2,
                      encoding="MSRA"),
        TRAIN=dict(batch_per_gpu=4),
        EVAL=dict(metric=["PCK"]),
    ))

    def grab(procs):
        with DataLoader(
            cfg, "test", batch_size=4, use_device_pipeline=False,
            num_workers=2, drop_last=False, decode_procs=procs,
        ) as loader:
            if procs:
                assert loader.decode_pool is not None
            batch = next(iter(loader.batches(0, prefetch=0)))
        if procs:
            assert loader.decode_pool is None  # close() released it
        return batch

    b_mp, b_ip = grab(2), grab(0)
    for k in ("joints_canvas", "center_canvas", "scale_canvas", "offset",
              "img_scale"):
        np.testing.assert_allclose(b_mp[k], b_ip[k], rtol=0, atol=1e-5,
                                   err_msg=k)
    d = np.abs(
        b_mp["img_raw"].astype(np.float32) - b_ip["img_raw"].astype(np.float32)
    )
    assert d.mean() < 3.0
