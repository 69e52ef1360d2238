"""Pooling ops with PyTorch-exact edge semantics (NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool_ceil(x: jax.Array, window: int = 3, stride: int = 2, padding: int = 1) -> jax.Array:
    """MaxPool2d(kernel, stride, padding, ceil_mode=True) on NHWC input.

    The DeepLab stem uses ``nn.MaxPool2d(3, 2, 1, ceil_mode=True)``
    (models/deeplabv2.py:225); ceil mode changes the output grid (e.g. 128 -> 65
    rows) so it must be reproduced exactly for checkpoint parity. Implemented by
    right/bottom -inf padding to the ceil-mode extent followed by a fused
    ``reduce_window``.
    """
    n, h, w, c = x.shape

    def out_size(size: int) -> int:
        return -(-(size + 2 * padding - window) // stride) + 1  # ceil div

    oh, ow = out_size(h), out_size(w)
    # PyTorch drops a trailing window that would start entirely in padding.
    if (oh - 1) * stride >= h + padding:
        oh -= 1
    if (ow - 1) * stride >= w + padding:
        ow -= 1
    pad_h_hi = (oh - 1) * stride + window - h - padding
    pad_w_hi = (ow - 1) * stride + window - w - padding
    # -inf init keeps this on the differentiable reduce_window_max primitive
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, max(pad_h_hi, 0)), (padding, max(pad_w_hi, 0)), (0, 0)),
    )


def global_avg_pool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d((1,1)) on NHWC, returning (N, C)."""
    return jnp.mean(x, axis=(1, 2))
