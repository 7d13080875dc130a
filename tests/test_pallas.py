"""Pallas kernels (interpret mode on CPU): parity vs the XLA reference ops."""

import numpy as np

from litehandnet_tpu.models.attention import soft_pool
from litehandnet_tpu.ops.blur import gaussian_blur
from litehandnet_tpu.ops.pallas_kernels import blur_log, softpool_2x2


def test_softpool_parity(rng):
    x = rng.normal(size=(2, 16, 16, 32)).astype(np.float32)
    want = np.asarray(soft_pool(x, 2, 2))
    got = np.asarray(softpool_2x2(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_blur_log_parity(rng):
    hm = rng.uniform(0, 1, size=(2, 32, 32, 21)).astype(np.float32)
    want = np.log(
        np.maximum(
            np.asarray(
                gaussian_blur(hm, 11, border="constant", preserve_max=True)
            ),
            1e-10,
        )
    )
    got = np.asarray(blur_log(hm, kernel=11))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
