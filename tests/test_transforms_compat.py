"""Host-side transform pipeline: internal consistency with the fused device
pipeline (both wrap the same jnp ops)."""

import numpy as np

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.data.transforms import (
    Compose,
    NormalizeTensor,
    ToTensor,
    TopDownAffine,
    TopDownGenerateTarget,
    GenerateSimDR,
)


def test_host_pipeline_matches_device(rng, tmp_path):
    import jax
    from PIL import Image

    from litehandnet_tpu.data.device_pipeline import DevicePipeline

    W = H = 64
    img = rng.randint(0, 255, size=(96, 96, 3), dtype=np.uint8)
    path = tmp_path / "x.png"
    Image.fromarray(img).save(path)

    joints = rng.uniform(10, 80, size=(21, 2)).astype(np.float32)
    center = np.float32([48, 48])
    scale = np.float32([96 / 200, 96 / 200])
    ann_info = {
        "image_size": np.array([W, H]),
        "heatmap_size": np.array([16, 16]),
        "num_joints": 21,
        "flip_index": list(range(21)),
    }
    results = {
        "img": img.astype(np.float32),
        "joints_3d": np.concatenate([joints, np.ones((21, 1))], axis=1),
        "joints_3d_visible": np.ones((21, 3), np.float32),
        "center": center,
        "scale": scale,
        "rotation": 0,
        "ann_info": ann_info,
    }
    host = Compose([
        TopDownAffine(),
        ToTensor(),
        NormalizeTensor(),
        TopDownGenerateTarget(2, "MSRA", True),
        GenerateSimDR(2, 2),
    ])(dict(results))

    cfg = config_from_dict(
        dict(
            DATASET=dict(num_joints=21, image_size=[W, H], heatmap_size=[16, 16]),
            PIPELINE=dict(flip_prob=0, rot_prob=0, rot_factor=0,
                          scale_factor=0, sigma=2, encoding="MSRA",
                          unbiased_encoding=True, simdr_split_ratio=2),
        )
    )
    pipe = DevicePipeline(cfg, ann_info["flip_index"], is_train=False)
    canvas = np.zeros((1, 96, 96, 3), np.uint8)
    canvas[0] = img
    dev = pipe(
        canvas, joints[None], np.ones((1, 21), np.float32), center[None],
        scale[None], np.zeros(1, np.float32), jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        host["img"], np.asarray(dev["img"][0]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        host["target"], np.asarray(dev["target"][0]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        host["simdr_x"], np.asarray(dev["simdr_x"][0]), rtol=1e-4, atol=1e-5
    )


def _skimage_exposure_shim():
    """Minimal faithful `skimage.exposure` (absent from this env) so the
    reference's utils/data_augmentation.py imports and RUNS. Implements
    the documented skimage algorithm: intensities are scaled by the dtype
    range (255 for uint8 — the reference pipeline feeds cv2 uint8 images,
    loading.py:6-89), transformed, rescaled, and cast back."""
    import types

    def _scale(image):
        return 255.0 if image.dtype == np.uint8 else 1.0

    def adjust_gamma(image, gamma=1, gain=1):
        s = _scale(image)
        out = ((image.astype(np.float64) / s) ** gamma) * s * gain
        return out.astype(image.dtype)

    def adjust_sigmoid(image, cutoff=0.5, gain=10, inv=False):
        s = _scale(image)
        out = 1.0 / (1.0 + np.exp(gain * (cutoff - image / s))) * s
        return out.astype(image.dtype)

    exposure = types.ModuleType("skimage.exposure")
    exposure.adjust_gamma = adjust_gamma
    exposure.adjust_sigmoid = adjust_sigmoid
    skimage = types.ModuleType("skimage")
    skimage.exposure = exposure
    return skimage, exposure


def test_photometric_parity_with_reference(rng, monkeypatch):
    """gamma/sigmoid adjust vs the reference wrappers
    (utils/data_augmentation.py:14-47) executed live: seed numpy, let the
    reference draw its random p/gamma/gain, replicate the same draws to
    recover the parameters, and require our jnp ops to produce the same
    image through the reference's own code path."""
    import pytest

    from tests import ref_loader

    if not ref_loader.reference_available():
        pytest.skip("reference absent")
    import sys, types

    monkeypatch.setitem(
        sys.modules, "torchvision", types.ModuleType("torchvision"))
    skimage, exposure = _skimage_exposure_shim()
    monkeypatch.setitem(sys.modules, "skimage", skimage)
    monkeypatch.setitem(sys.modules, "skimage.exposure", exposure)
    # the module does `from utils.visualization_tools import ...` (:7) —
    # resolvable only with the reference root on sys.path
    ref_loader.ensure_reference_importable()
    ref = ref_loader._load("utils/data_augmentation.py", "_ref_data_aug")

    from litehandnet_tpu.ops.photometric import adjust_gamma, adjust_sigmoid

    img_u8 = rng.randint(0, 255, size=(32, 32, 3)).astype(np.uint8)
    img = img_u8.astype(np.float32)

    for seed in (3, 4, 5):
        np.random.seed(seed)
        want = np.asarray(ref.adjust_gamma(img_u8.copy(), 1.0), np.float32)
        np.random.seed(seed)  # replicate the reference's draws (:23-27)
        p = np.random.rand()
        gamma = (np.random.randint(2, 10) / 10 if p < 0.5
                 else float(np.random.randint(1, 3)))
        got = np.asarray(adjust_gamma(img, gamma))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1.0)

        np.random.seed(seed)
        want = np.asarray(ref.adjust_sigmoid(img_u8.copy(), 1.0), np.float32)
        np.random.seed(seed)  # replicate the reference's draw (:38-40)
        np.random.rand()
        gain = float(np.random.randint(3, 5))
        got = np.asarray(adjust_sigmoid(img, gain=gain))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1.0)
