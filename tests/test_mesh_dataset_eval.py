"""The composed production eval path on a multi-device mesh (VERDICT r4 #3):
COCO-json fixture -> data/loader.DataLoader(sharding=...) -> DevicePipeline
public __call__ -> deploy forward -> batched DARK decode ->
dataset.evaluate(), asserting PCK/AUC/EPE equal to the single-device run.

Replaces the reference's eval loop (test.py:63-154, whose multi-device
analogue was nn.DataParallel at test.py:81) at mesh scale. The heavy
lifting lives in __graft_entry__._dryrun_dataset_eval so the driver's
MULTICHIP dryrun and the test suite exercise the SAME code.
"""

import jax
import pytest

pytestmark = pytest.mark.slow


def test_dataset_eval_on_mesh_matches_single_device():
    from jax.sharding import Mesh

    from __graft_entry__ import _dryrun_dataset_eval

    n = min(8, len(jax.devices()))
    assert n >= 2, "conftest must provide the 8-device CPU platform"
    mesh = Mesh(jax.devices()[:n], ("data",))
    _dryrun_dataset_eval(n, mesh)
