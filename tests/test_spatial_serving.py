"""Spatial-partitioning serving (eval/spatial_serving.py): the
height-sharded forward must equal the single-device forward end-to-end
(through DARK decode), and the intermediate image must actually be split
across every device on the mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from litehandnet_tpu.config.templates import make_cfg
from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.eval.spatial_serving import make_spatial_serve, spatial_spec
from litehandnet_tpu.models import get_model
from litehandnet_tpu.train.distributed import make_mesh


def _tiny_model(size=64):
    cfg = config_from_dict(make_cfg(
        "litehandnet", "freihand", exp_id=906, image_size=size,
        **{"MODEL.input_channel": 32, "MODEL.num_block": [1, 1, 1]}))
    model = get_model(cfg, deploy=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False)
    return model, variables


@pytest.mark.parametrize("n_dev", [8])
def test_spatial_serve_matches_single_device(n_dev):
    if jax.device_count() < n_dev:
        pytest.skip("needs 8 virtual devices")
    size, B, K = 64, 1, 21
    mesh = make_mesh(n_dev)
    model, variables = _tiny_model(size)

    rng = np.random.RandomState(0)
    img = rng.normal(0, 1, (B, size, size, 3)).astype(np.float32)
    centers = np.full((B, 2), size / 2, np.float32)
    scales = np.full((B, 2), size / 200, np.float32)

    serve = make_spatial_serve(model, mesh)
    preds_sp, maxv_sp = serve(variables, img, centers, scales)

    dev0 = jax.devices()[0]
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    from litehandnet_tpu.ops.decode import keypoints_from_heatmaps
    hm = fwd(jax.device_put(variables, dev0), jax.device_put(img, dev0))
    if isinstance(hm, (list, tuple)):
        hm = hm[-1]
    _, preds_1, maxv_1 = keypoints_from_heatmaps(
        hm, jnp.asarray(centers), jnp.asarray(scales),
        post_process="unbiased", kernel=11)

    np.testing.assert_allclose(
        np.asarray(preds_sp), np.asarray(preds_1), rtol=1e-5, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(maxv_sp), np.asarray(maxv_1), rtol=1e-4, atol=1e-5)


def test_spatial_constraint_actually_splits():
    """The height axis must really be partitioned: check the sharded
    intermediate by jitting just the constraint."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    x = jnp.zeros((1, 64, 64, 3))
    sharded = jax.jit(
        lambda a: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, spatial_spec())),
        out_shardings=NamedSharding(mesh, spatial_spec()))(x)
    shards = sharded.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape[1] == 8 for s in shards), [
        s.data.shape for s in shards]


def test_spatial_serve_rejects_indivisible_height():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    model, variables = _tiny_model(64)
    serve = make_spatial_serve(model, mesh)
    bad = np.zeros((1, 68, 64, 3), np.float32)
    with pytest.raises(AssertionError):
        serve(variables, bad, np.zeros((1, 2), np.float32),
              np.ones((1, 2), np.float32))
