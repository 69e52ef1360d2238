"""Device-side augmentation + prefetch tests."""

import numpy as np

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.data.device_pipeline import device_prefetch
from thermal_semantic_segmentation_tpu.ops.augment import (
    ir_window_normalize, random_resized_crop_flip)


def _images(b=4, h=320, w=700, c=1, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (b, h, w, c)).astype(np.float32))


def test_shapes_and_determinism():
    images = _images()
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 13, (4, 320, 700)))
    key = jax.random.key(0)
    out1, lab1 = random_resized_crop_flip(key, images, labels=labels)
    out2, lab2 = random_resized_crop_flip(key, images, labels=labels)
    assert out1.shape == (4, 256, 512, 1)
    assert lab1.shape == (4, 256, 512)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(lab1), np.asarray(lab2))
    # different key -> different crops
    out3, _ = random_resized_crop_flip(jax.random.key(1), images, labels=labels)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_values_within_input_range_and_labels_valid():
    images = _images(seed=2)
    labels = jnp.asarray(np.random.default_rng(3).integers(0, 13, (4, 320, 700)))
    out, lab = random_resized_crop_flip(jax.random.key(7), images, labels=labels)
    # bilinear of [0,1] data stays in [0,1]
    assert float(out.min()) >= -1e-5 and float(out.max()) <= 1 + 1e-5
    assert int(lab.min()) >= 0 and int(lab.max()) <= 12


def test_identity_crop_recovers_resize():
    """scale=(1,1) with the input's exact aspect ratio -> whole-image resize."""
    images = _images(b=2, h=256, w=512, seed=4)
    r = 512 / 256
    out, _ = random_resized_crop_flip(jax.random.key(0), images,
                                      out_hw=(256, 512), scale=(1.0, 1.0),
                                      ratio=(r, r), flip_p=0.0)
    # crop == full image and out size == in size -> identity (half-pixel centers)
    np.testing.assert_allclose(np.asarray(out), np.asarray(images), atol=1e-5)


def test_flip_probability_one_mirrors():
    images = _images(b=2, h=256, w=512, seed=5)
    r = 512 / 256
    out, _ = random_resized_crop_flip(jax.random.key(0), images,
                                      out_hw=(256, 512), scale=(1.0, 1.0),
                                      ratio=(r, r), flip_p=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(images)[:, :, ::-1],
                               atol=1e-5)


def test_normalize_applied():
    images = _images(b=1, seed=6)
    out, _ = random_resized_crop_flip(jax.random.key(0), images,
                                      mean=jnp.asarray([0.5]), std=jnp.asarray([0.5]))
    assert float(out.min()) >= -1.001 and float(out.max()) <= 1.001


def test_ir_window_normalize():
    raw = jnp.asarray([[20000.0, 21800.0, 23400.0, 25000.0, 30000.0]])
    out = np.asarray(ir_window_normalize(raw))
    np.testing.assert_allclose(out, [[0.0, 0.0, 0.5, 1.0, 1.0]], atol=1e-6)


def test_device_prefetch_order_preserved():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches)))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
