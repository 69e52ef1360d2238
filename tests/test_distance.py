"""SSIM + translation-distance eval tests."""

import numpy as np

import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.eval.distance import evaluate_distance
from thermal_semantic_segmentation_tpu.ops.ssim import ssim


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 48, 1)).astype(np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5


def test_ssim_decreases_with_noise_and_symmetric():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32)
    small = x + rng.normal(0, 0.02, x.shape).astype(np.float32)
    big = x + rng.normal(0, 0.3, x.shape).astype(np.float32)
    s_small = float(ssim(jnp.asarray(x), jnp.asarray(small)))
    s_big = float(ssim(jnp.asarray(x), jnp.asarray(big)))
    assert s_small > s_big
    assert 0.0 < s_big < s_small < 1.0
    assert abs(float(ssim(jnp.asarray(small), jnp.asarray(x))) - s_small) < 1e-5


def test_ssim_matches_reference_formula_flat_patch():
    """Uniform images: SSIM reduces to the luminance term (2ab+C1)/(a^2+b^2+C1)
    times the contrast term C2/C2 = 1."""
    a, b = 0.3, 0.6
    x = jnp.full((1, 16, 16, 1), a)
    y = jnp.full((1, 16, 16, 1), b)
    want = (2 * a * b + 0.01 ** 2) / (a ** 2 + b ** 2 + 0.01 ** 2)
    np.testing.assert_allclose(float(ssim(x, y)), want, rtol=1e-4)


def test_evaluate_distance_loop():
    rng = np.random.default_rng(2)

    class FakeLoader:
        def __iter__(self):
            for s in range(2):
                ori = rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
                yield {"original": ori, "translated": ori * 0.9}

    l1, s = evaluate_distance(FakeLoader())
    assert 0 < l1 < 0.1
    assert 0.5 < s <= 1.0
