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


def test_kmeans_ref_parity_with_reference():
    """kmeans_ref / size_thresholds must match the reference's _k_means /
    _get_threshold exactly. The reference module's imports are broken as
    shipped (config.config_dict / data.get_dataset don't exist), so only
    its two pure-numpy functions are exec'd, with the broken import lines
    stripped (NOT stubbed via sys.modules, which would leak into every
    later test that imports the real reference config package)."""
    from tests import ref_loader
    from litehandnet_tpu.utils.kmeans import kmeans_ref, size_thresholds

    if not ref_loader.reference_available():
        import pytest

        pytest.skip("reference absent")
    src = open("/root/reference/utils/k_means.py").read()
    src = src.split("if __name__")[0]  # skip the dataset-loading driver
    src = "\n".join(
        ln for ln in src.splitlines()
        if not ln.startswith(("from config", "from data"))
    )
    ns = {}
    exec(compile(src, "ref_k_means", "exec"), ns)

    rng = np.random.RandomState(7)
    sizes = np.concatenate([
        rng.uniform(0.05, 0.3, 40), rng.uniform(0.35, 0.55, 30),
        rng.uniform(0.6, 0.95, 30),
    ]).tolist()
    want_c, want_n = ns["_k_means"](sizes)
    got_c, got_n = kmeans_ref(sizes)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-12)
    np.testing.assert_allclose(got_n, want_n)
    want_thr, want_cnt = ns["_get_threshold"](sizes, want_c)
    got_thr, got_cnt = size_thresholds(sizes, got_c)
    np.testing.assert_allclose(got_thr, want_thr, rtol=1e-12)
    assert got_cnt == list(want_cnt)


def test_split_testset_cli(tmp_path):
    """The split CLI partitions a COCO json into size bins: disjoint,
    exhaustive, and ordered by relative bbox area."""
    import json

    from litehandnet_tpu.tools.split_testset import main

    rng = np.random.RandomState(5)
    images, annotations = [], []
    for i in range(120):
        images.append(dict(id=i, file_name=f"{i}.jpg", width=224,
                           height=224))
        side = float(rng.choice([40, 100, 160, 210]) + rng.uniform(-8, 8))
        annotations.append(dict(
            id=i, image_id=i, category_id=1, iscrowd=0,
            bbox=[5.0, 5.0, side, side], area=side * side, keypoints=[],
        ))
    ann_path = tmp_path / "test.json"
    ann_path.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="hand")],
    )))
    out = tmp_path / "splits"
    paths = main(["--ann", str(ann_path), "--image-size", "224", "224",
                  "--out-dir", str(out)])
    assert len(paths) == 4
    seen = []
    prev_max = -1.0
    for pth in paths:
        d = json.loads(open(pth).read())
        ids = [a["id"] for a in d["annotations"]]
        seen += ids
        assert {im["id"] for im in d["images"]} == {
            a["image_id"] for a in d["annotations"]
        }
        if d["annotations"]:
            areas = [a["bbox"][2] * a["bbox"][3] for a in d["annotations"]]
            assert min(areas) >= prev_max  # bins ordered small -> large
            prev_max = max(areas)
    assert sorted(seen) == list(range(120))


def test_split_testset_degenerate_clusters(tmp_path):
    """Empty clusters (the reference quirk decays their centers to ~0,
    unsorting the list) are dropped with a warning instead of silently
    mis-binning; a single initial center yields one bin without crashing."""
    import json

    from litehandnet_tpu.tools.split_testset import main

    rng = np.random.RandomState(7)
    images, annotations = [], []
    for i in range(40):
        images.append(dict(id=i, file_name=f"{i}.jpg", width=224, height=224))
        side = float(rng.uniform(30, 60))  # all tiny: rel area < 0.08
        annotations.append(dict(
            id=i, image_id=i, category_id=1, iscrowd=0,
            bbox=[5.0, 5.0, side, side], area=side * side, keypoints=[],
        ))
    ann_path = tmp_path / "test.json"
    ann_path.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="hand")],
    )))

    paths = main(["--ann", str(ann_path), "--image-size", "224", "224",
                  "--out-dir", str(tmp_path / "deg")])
    total = sum(
        len(json.loads(open(p).read())["annotations"]) for p in paths
    )
    assert total == 40  # nothing lost to a phantom 0-center bin
    assert 1 <= len(paths) < 4  # the empty clusters were dropped

    paths1 = main(["--ann", str(ann_path), "--image-size", "224", "224",
                   "--out-dir", str(tmp_path / "one"), "--clusters", "0.5",
                   "--names", "all"])
    assert len(paths1) == 1
    assert len(json.loads(open(paths1[0]).read())["annotations"]) == 40


def test_dataset_info_rhd_alias():
    """Reference configs name the dataset 'rhd' (config/*/rhd2d/_*.py:14)
    while the metadata dict is 'rhd2d'; both keys must resolve."""
    from litehandnet_tpu.data.dataset_info import DATASET_INFOS

    assert DATASET_INFOS["rhd"] is DATASET_INFOS["rhd2d"]
