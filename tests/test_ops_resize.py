"""Parity tests for resize ops against PyTorch F.interpolate."""

import numpy as np
import pytest

import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    sample_bilinear_at,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((33, 65), (256, 512)),   # the canonical logits upsample (stride-8 -> label res)
    ((80, 175), (64, 128)),   # self-training quarter-res resampling
    ((7, 9), (13, 29)),
    ((16, 16), (8, 8)),       # downsample
    ((5, 5), (1, 7)),         # out dim 1 edge case
])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    x = _rand((2, *in_hw, 3))
    got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw, align_corners=True))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_bilinear_no_align_corners_matches_torch():
    x = _rand((1, 10, 14, 2), seed=3)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 23, 9, align_corners=False))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(23, 9),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 128), (256, 512)), ((9, 7), (5, 3))])
def test_nearest_matches_torch(in_hw, out_hw):
    x = _rand((2, *in_hw, 1), seed=1)
    got = np.asarray(resize_nearest(jnp.asarray(x), *out_hw))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_sample_bilinear_at_equals_resize_then_crop():
    """full2weak building block: sampling at affine coords == align-corners
    resize followed by a crop (self_training.py:145-152 semantics)."""
    x = _rand((2, 80, 175, 4), seed=2)
    out_h, out_w = 40, 90
    y0, x0 = 13, 21
    crop_h, crop_w = 20, 50

    # reference composition, done exactly
    resized = np.asarray(resize_bilinear(jnp.asarray(x), out_h, out_w, align_corners=True))
    want = resized[:, y0:y0 + crop_h, x0:x0 + crop_w]

    scale_r = (80 - 1) / (out_h - 1)
    scale_c = (175 - 1) / (out_w - 1)
    rows = (np.arange(crop_h) + y0) * scale_r
    cols = (np.arange(crop_w) + x0) * scale_c
    got = np.asarray(sample_bilinear_at(
        jnp.asarray(x),
        jnp.asarray(np.tile(rows[None], (2, 1)), dtype=jnp.float32),
        jnp.asarray(np.tile(cols[None], (2, 1)), dtype=jnp.float32),
    ))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_stem_s2d_exact_vs_plain_conv():
    """StemConv's space-to-depth path must equal the plain 7x7/s2 conv
    exactly in f32 (same taps, rearranged)."""
    import jax
    import jax.numpy as jnp
    from thermal_semantic_segmentation_tpu.nn.resnet import StemConv

    for c, hw in ((1, (64, 128)), (3, (32, 48))):
        x = jnp.asarray(np.random.default_rng(c).normal(size=(2, *hw, c)),
                        jnp.float32)
        plain = StemConv(s2d=False)
        fast = StemConv(s2d=True)
        variables = plain.init(jax.random.key(0), x)
        np.testing.assert_allclose(
            np.asarray(fast.apply(variables, x)),
            np.asarray(plain.apply(variables, x)), rtol=1e-5, atol=1e-5)

    # odd input sizes fall back to the plain path
    x = jnp.ones((1, 31, 33, 1), jnp.float32)
    variables = StemConv(s2d=False).init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(StemConv(s2d=True).apply(variables, x)),
        np.asarray(StemConv(s2d=False).apply(variables, x)), rtol=1e-6)
