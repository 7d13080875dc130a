"""LiteHandNet: shape, param count, and re-parameterization parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litehandnet_tpu.config import config_from_dict
from litehandnet_tpu.models import fuse_params, get_model


def _cfg(ca_type="ca", activation="leakyrelu", features=64):
    return config_from_dict(
        dict(
            MODEL=dict(
                name="litehandnet",
                num_stage=4,
                num_block=[2, 2, 2],
                input_channel=features,
                ca_type=ca_type,
                reduction=4,
                activation=activation,
                output_channel=21,
            ),
            DATASET=dict(num_joints=21, image_size=[128, 128], heatmap_size=[32, 32]),
        )
    )


def test_forward_shape():
    cfg = _cfg()
    model = get_model(cfg)
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 32, 32, 21)
    assert np.isfinite(np.asarray(out)).all()


def test_param_count_close_to_reference():
    """Reference litehandnet (deployed) = 2.266M params at 128ch/r4
    (BASELINE.md §B); train-mode graph has extra rep branches."""
    cfg = _cfg(features=128)
    model = get_model(cfg, deploy=True)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert 1.8e6 < n < 2.8e6, n


def test_train_mode_has_batch_stats():
    cfg = _cfg()
    model = get_model(cfg)
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape == (2, 32, 32, 21)
    assert "batch_stats" in mutated


@pytest.mark.parametrize("ca_type", [
    "ca",
    pytest.param("se", marks=pytest.mark.slow),
    pytest.param("none", marks=pytest.mark.slow),
])
def test_reparam_deploy_parity(ca_type, rng):
    """Deploy-fused model must reproduce train-graph (eval mode) outputs
    (reference invariant: liteHandNet.py:240-244 + repblocks.py:214-236)."""
    cfg = _cfg(ca_type=ca_type)
    model = get_model(cfg)
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # perturb batch stats away from init so fusion is non-trivial
    def jitter(path, v):
        leaf = "/".join(str(p.key) for p in path)
        r = np.random.RandomState(hash(leaf) % (2**31))
        if leaf.endswith("mean"):
            return v + jnp.asarray(r.normal(0, 0.1, v.shape), v.dtype)
        if leaf.endswith("var"):
            return v * jnp.asarray(r.uniform(0.5, 2.0, v.shape), v.dtype)
        return v

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        jitter, variables["batch_stats"]
    )

    want = model.apply(variables, x, train=False)

    deploy_model = get_model(cfg, deploy=True)
    deploy_vars = fuse_params(variables)
    got = deploy_model.apply(deploy_vars, x, train=False)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4
    )


def test_fold_input_normalization(rng):
    """fold_input_normalization on a VALID-padded first conv is exact:
    conv((x - mean)/std) == folded_conv(x) wherever only real pixels are
    read (the transform's licensed domain; with zero-padding the border
    ring deviates by construction — see the docstring)."""
    from flax import linen as nn

    from litehandnet_tpu.models.reparam import fold_input_normalization

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=(2, 2), padding="VALID",
                        name="stem")(x)
            return nn.leaky_relu(nn.Conv(4, (1, 1), name="head")(x))

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    mean = np.float32([0.485, 0.456, 0.406]) * 255.0
    std = np.float32([0.229, 0.224, 0.225]) * 255.0
    raw = rng.randint(0, 256, size=(2, 32, 32, 3)).astype(np.float32)

    want = model.apply(variables, jnp.asarray((raw - mean) / std))
    folded = fold_input_normalization(variables, mean, std,
                                      conv_path=("stem",))
    got = model.apply(folded, jnp.asarray(raw))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # everything outside conv_path is shared, not copied
    assert folded["params"]["head"] is variables["params"]["head"]
