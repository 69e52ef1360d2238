"""Differentiable Canny edge extractor with fixed weights, NHWC.

Behavioral spec: models/net_canny.py:7-155 — 5-tap Gaussian(sigma=1,
unnormalized) blur, Sobel gradients, orientation quantized to 45-degree bins,
8-direction non-max suppression, threshold. Used frozen as a contour target
for the GAN's edge-consistency loss (train.py:168-195).

TPU-first fixes vs the reference:
- NMS is a vectorized take_along_axis over the 8 directional responses keyed
  by the quantized orientation. The reference's flat gather (net_canny.py:
  131-137) hardcodes the batch size AND omits the per-sample offset, so for
  batch >= 2 every sample selects from sample 0's directional responses; both
  defects are fixed here (parity with the reference holds at batch size 1).
- Pure function of the input; the fixed filters are compile-time constants
  folded by XLA, so there is nothing to "freeze".
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _safe_magnitude(gx: jax.Array, gy: jax.Array) -> jax.Array:
    """sqrt(gx^2 + gy^2) with a NaN-free backward at exactly zero.

    The gradient of sqrt at 0 is inf, and flat regions (ubiquitous in
    piecewise-constant synthetic frames and in tanh-saturated generator
    outputs) hit exactly 0 — the masking ``where``s downstream then multiply
    a ZERO cotangent by that inf, which is NaN, and one step poisons every
    parameter (measured: the round-4 GAN gate went all-NaN within 10 steps
    once the contour loss started backpropagating through these edges; the
    reference never sees this because train.py:186-189 detaches both sides).
    Double-where keeps the forward value bit-identical and the backward 0.
    """
    m2 = gx * gx + gy * gy
    pos = m2 > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, m2, 1.0)), 0.0)


def _gaussian5(std: float = 1.0) -> np.ndarray:
    # scipy.signal.gaussian(5, std): unnormalized exp(-x^2 / (2 std^2))
    x = np.arange(5, dtype=np.float64) - 2.0
    return np.exp(-(x ** 2) / (2.0 * std ** 2)).astype(np.float32)

_SOBEL = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)

# 8 directional difference filters, 0/45/.../315 degrees (net_canny.py:38-70)
_DIRS = np.stack([
    [[0, 0, 0], [0, 1, -1], [0, 0, 0]],
    [[0, 0, 0], [0, 1, 0], [0, 0, -1]],
    [[0, 0, 0], [0, 1, 0], [0, -1, 0]],
    [[0, 0, 0], [0, 1, 0], [-1, 0, 0]],
    [[0, 0, 0], [-1, 1, 0], [0, 0, 0]],
    [[-1, 0, 0], [0, 1, 0], [0, 0, 0]],
    [[0, -1, 0], [0, 1, 0], [0, 0, 0]],
    [[0, 0, -1], [0, 1, 0], [0, 0, 0]],
]).astype(np.float32)


def _conv2d_fixed(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """x: (N,H,W,Cin); kernel: (kh,kw) applied depthwise-free (Cin=1) or
    (kh,kw,cin,cout). SAME padding, cross-correlation (torch conv semantics)."""
    k = np.asarray(kernel, np.float32)
    if k.ndim == 2:
        k = k[:, :, None, None]
    return lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(k),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _blur_sobel(chan: jax.Array):
    """chan: (N,H,W,1) -> (blurred, gx, gy)."""
    g = _gaussian5()
    blurred = _conv2d_fixed(_conv2d_fixed(chan, g[None, :]), g[:, None])
    gx = _conv2d_fixed(blurred, _SOBEL)
    gy = _conv2d_fixed(blurred, _SOBEL.T)
    return blurred, gx, gy


def canny_edges(img: jax.Array, *, threshold: float = 10.0) -> jax.Array:
    """img: (N, H, W, C) with C in {1, 3} -> thresholded thin edges (N, H, W, 1)."""
    c = img.shape[-1]
    if c == 3:
        mags, gxs, gys = [], [], []
        for ch in range(3):
            _, gx, gy = _blur_sobel(img[..., ch:ch + 1])
            mags.append(_safe_magnitude(gx, gy))
            gxs.append(gx)
            gys.append(gy)
        grad_mag = mags[0] + mags[1] + mags[2]
        grad_x = gxs[0] + gxs[1] + gxs[2]
        grad_y = gys[0] + gys[1] + gys[2]
    elif c == 1:
        _, grad_x, grad_y = _blur_sobel(img)
        grad_mag = _safe_magnitude(grad_x, grad_y)
    else:
        raise ValueError("Channel number does not fit.")

    orientation = jnp.arctan2(grad_y, grad_x) * (180.0 / 3.14159) + 180.0
    orientation = jnp.round(orientation / 45.0) * 45.0

    directional = lax.conv_general_dilated(
        grad_mag, jnp.asarray(_DIRS.transpose(1, 2, 0)[..., None, :]),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))        # (N,H,W,8)

    idx_pos = (jnp.round(orientation / 45.0).astype(jnp.int32)) % 8  # (N,H,W,1)
    idx_neg = (idx_pos + 4) % 8
    # one-hot select instead of take_along_axis (TPU gathers at image shapes
    # are ~30x slower than the equivalent multiply-reduce)
    oh_pos = jax.nn.one_hot(idx_pos[..., 0], 8, dtype=directional.dtype)
    oh_neg = jax.nn.one_hot(idx_neg[..., 0], 8, dtype=directional.dtype)
    sel_pos = jnp.sum(directional * oh_pos, axis=-1, keepdims=True)
    sel_neg = jnp.sum(directional * oh_neg, axis=-1, keepdims=True)

    is_max = jnp.minimum(sel_pos, sel_neg) > 0.0
    thin = jnp.where(is_max, grad_mag, 0.0)
    return jnp.where(thin < threshold, 0.0, thin)
