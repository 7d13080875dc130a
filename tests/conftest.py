"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip behavior (DP mesh, shard_map, collectives) is tested on CPU with
`--xla_force_host_platform_device_count=8` — the TPU-native answer to the
reference's untestable-without-GPUs distributed path (SURVEY.md §4).

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's site config pins JAX_PLATFORMS to the remote-TPU platform;
# the env var alone is not enough, so force CPU through the config API too.
jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache: repeat suite runs skip most compilation.
# Keyed by host CPU flags: the cache key does NOT cover the host microarch,
# and /tmp can survive across driver machines — a cache written on another
# CPU loads AOT executables with mismatched machine features (XLA warns of
# SIGILL, and instruction selection differs enough to flip marginal
# float-tolerance tests).
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _cpu = next((ln for ln in _f if ln.startswith("flags")), "")
except OSError:
    _cpu = ""
_key = hashlib.sha1(_cpu.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/lhn_jax_cache_{_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The `fast` tier (pytest -m fast): a <5-minute regression loop touching
# every subsystem — config, data, host+device transforms, encode/affine,
# models (reparam), losses, optimizer, trainer, distributed, decode,
# eval/metrics, detect/NMS, parsers, native loader, Pallas, CLIs.
# Tagged per-module here (single source of truth); `slow`-marked tests
# inside these modules stay out of the tier.
FAST_MODULES = {
    "test_configs", "test_data", "test_transforms_compat", "test_encode",
    "test_affine", "test_decode", "test_losses", "test_optim",
    "test_distributed", "test_detect",
    "test_heatmap_parser", "test_coco_eval", "test_mpii_eval",
    "test_legacy_eval", "test_centermap", "test_native_loader",
    "test_pallas", "test_import_cli", "test_rep_blocks",
}
# compile-dominated outliers (>50 s each, measured): the step/scaler
# machinery they cover stays represented in fast by test_eval_step and
# test_initialize_multihost_runs_before_backend_init
FAST_EXCLUDE = {"test_loss_scaler_wired", "test_train_step_runs_and_learns",
                "test_remat_matches_plain_step"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = os.path.basename(str(item.fspath))[:-3]
        if (name in FAST_MODULES and item.get_closest_marker("slow") is None
                and item.originalname not in FAST_EXCLUDE):
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
