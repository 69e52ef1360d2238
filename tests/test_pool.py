"""max_pool_ceil parity with torch MaxPool2d(ceil_mode=True)."""

import numpy as np
import pytest
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.ops.pool import max_pool_ceil, global_avg_pool

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("hw", [(128, 256), (65, 129), (7, 7), (10, 13)])
def test_maxpool_ceil_matches_torch(hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *hw, 5)).astype(np.float32)
    got = np.asarray(max_pool_ceil(jnp.asarray(x)))
    m = torch.nn.MaxPool2d(kernel_size=3, stride=2, padding=1, ceil_mode=True)
    want = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_global_avg_pool():
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    got = np.asarray(global_avg_pool(jnp.asarray(x)))
    np.testing.assert_allclose(got, x.mean(axis=(1, 2)), rtol=1e-6)
