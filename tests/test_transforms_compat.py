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


def test_photometric_parity_with_reference(rng):
    """gamma/sigmoid adjust vs the reference numpy implementations."""
    import pytest

    from tests import ref_loader

    if not ref_loader.reference_available():
        pytest.skip("reference absent")
    import sys, types

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    try:
        ref = ref_loader._load(
            "utils/data_augmentation.py", "_ref_data_aug"
        )
    except Exception as e:  # heavy imports in the reference module
        pytest.skip(f"reference module unloadable: {e}")

    from litehandnet_tpu.ops.photometric import adjust_gamma, adjust_sigmoid

    img = rng.randint(0, 255, size=(32, 32, 3)).astype(np.float32)
    if hasattr(ref, "adjust_gamma"):
        want = np.asarray(ref.adjust_gamma(img.copy(), 1.5), np.float32)
        got = np.asarray(adjust_gamma(img, 1.5))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1.0)
    if hasattr(ref, "adjust_sigmoid"):
        want = np.asarray(ref.adjust_sigmoid(img.copy()), np.float32)
        got = np.asarray(adjust_sigmoid(img))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1.0)
