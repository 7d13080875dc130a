"""Golden parity for the CenterNet utilities (reference
utils/utils_centermap.py:8-234) plus the k-means size-split used for the
size-stratified FreiHAND eval splits (reference utils/k_means.py:7-75)."""

import numpy as np
import pytest

from tests import ref_loader

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def refmod():
    return ref_loader._load("utils/utils_centermap.py", "ref_utils_centermap")


def test_gaussian_radius_golden(refmod):
    from litehandnet_tpu.utils.centermap import gaussian_radius

    for h, w in [(8, 8), (3, 17), (40, 12), (100, 100), (1, 1)]:
        for ov in (0.3, 0.5, 0.7, 0.9):
            np.testing.assert_allclose(
                gaussian_radius((h, w), ov),
                refmod.gaussian_radius((h, w), ov),
                rtol=1e-12, err_msg=(h, w, ov),
            )


def test_draw_gaussian_golden(refmod):
    from litehandnet_tpu.utils.centermap import draw_gaussian

    rng = np.random.RandomState(0)
    for center, radius in [((20, 12), 5), ((0, 0), 4), ((63, 63), 7),
                           ((2, 60), 3)]:
        base = rng.uniform(0, 0.3, (64, 64)).astype(np.float32)
        ours = draw_gaussian(base.copy(), center, radius)
        want = refmod.draw_gaussian(base.copy(), center, radius)
        np.testing.assert_allclose(ours, want, rtol=1e-6,
                                   err_msg=(center, radius))


def test_pool_nms_golden(refmod):
    """NHWC jnp pool_nms == reference NCHW torch pool_nms."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from litehandnet_tpu.utils.centermap import pool_nms

    rng = np.random.RandomState(1)
    heat = rng.uniform(0, 1, (2, 16, 16, 4)).astype(np.float32)
    ours = np.asarray(pool_nms(jnp.asarray(heat)))
    want = refmod.pool_nms(
        torch.from_numpy(heat.transpose(0, 3, 1, 2))
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, rtol=1e-6)


def test_letterbox_golden(refmod):
    from PIL import Image

    from litehandnet_tpu.utils.centermap import letterbox

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (48, 80, 3), np.uint8)
    ours = letterbox(img, (64, 64))
    want = np.asarray(
        refmod.letterbox_image(Image.fromarray(img), (64, 64))
    )
    np.testing.assert_array_equal(ours, want)


def test_kmeans_size_split():
    """2-cluster 1-D k-means recovers well-separated size groups and
    split_by_size partitions the db accordingly (reference k_means.py)."""
    from litehandnet_tpu.utils.kmeans import kmeans_1d, split_by_size

    rng = np.random.RandomState(3)
    small = rng.normal(30.0, 2.0, 50)
    large = rng.normal(120.0, 5.0, 50)
    values = np.concatenate([small, large])
    centers, labels = kmeans_1d(values, k=2)  # centers sorted ascending
    assert (labels[:50] == 0).all() and (labels[50:] == 1).all()
    assert abs(centers[0] - 30.0) < 3 and abs(centers[1] - 120.0) < 6

    db = [dict(bbox=[0, 0, v, v], image_file=f"{i}.jpg")
          for i, v in enumerate(values)]
    groups = split_by_size(db, k=2)  # index lists, smallest cluster first
    assert sorted(groups[0]) == list(range(50))
    assert sorted(groups[1]) == list(range(50, 100))
