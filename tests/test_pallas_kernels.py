"""Pallas kernel parity (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.ops.pallas_kernels import upsample_argmax
from thermal_semantic_segmentation_tpu.ops.resize import resize_bilinear


def test_upsample_argmax_matches_xla_path():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 33, 65, 13)).astype(np.float32))
    pred, conf = upsample_argmax(logits, 256, 512, interpret=True)

    up = resize_bilinear(logits, 256, 512)
    want_pred = jnp.argmax(up, -1)
    want_conf = jnp.max(jax.nn.softmax(up, -1), -1)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(want_pred))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_conf),
                               rtol=1e-4, atol=1e-5)


def test_upsample_argmax_small_grid():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((1, 9, 17, 13)).astype(np.float32))
    pred, conf = upsample_argmax(logits, 64, 128, tile_h=32, interpret=True)
    up = resize_bilinear(logits, 64, 128)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(jnp.argmax(up, -1)))
    assert 0.0 < float(conf.min()) and float(conf.max()) <= 1.0
