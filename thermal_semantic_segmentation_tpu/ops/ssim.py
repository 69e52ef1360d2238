"""SSIM (structural similarity) on NHWC images.

Matches the defaults of the ``pytorch_msssim.ssim`` call used by the reference
translation-quality eval (distance_evaluate.py:9,47): 11x11 Gaussian window
with sigma 1.5 (normalized), K1=0.01, K2=0.03, per-channel filtering with
VALID padding, mean over the map ('size_average=True').
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter_valid(x: jax.Array, win: np.ndarray) -> jax.Array:
    """Separable depthwise gaussian filtering, VALID padding. x: (N,H,W,C).

    precision='highest' is load-bearing: TPU convs default to bf16 inputs,
    and the SSIM variance terms are catastrophic cancellations
    (E[x^2] - E[x]^2) whose operands agree to ~3 decimal digits — at bf16
    the 'variances' come out as noise (can go strongly negative) and the
    SSIM map explodes above 1 (observed: 'SSIM' 6.8 on chip for
    near-constant translations, correct [0, 1] on CPU)."""
    c = x.shape[-1]
    kh = jnp.asarray(np.tile(win[:, None, None, None], (1, 1, 1, c)))
    kw = jnp.asarray(np.tile(win[None, :, None, None], (1, 1, 1, c)))
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c, precision="highest")
    return lax.conv_general_dilated(y, kw, (1, 1), "VALID", dimension_numbers=dn,
                                    feature_group_count=c,
                                    precision="highest")


def ssim(x: jax.Array, y: jax.Array, *, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5,
         size_average: bool = True) -> jax.Array:
    """SSIM between NHWC images; returns a scalar (size_average) or (N,)."""
    win = _gaussian_window(win_size, sigma)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter_valid(x, win)
    mu_y = _filter_valid(y, win)
    mu_xx = _filter_valid(x * x, win)
    mu_yy = _filter_valid(y * y, win)
    mu_xy = _filter_valid(x * y, win)

    var_x = mu_xx - mu_x ** 2
    var_y = mu_yy - mu_y ** 2
    cov = mu_xy - mu_x * mu_y

    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
