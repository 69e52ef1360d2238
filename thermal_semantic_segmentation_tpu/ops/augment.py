"""Fused device-side augmentation.

The reference augments on the host with PIL per sample
(utils/transforms.py RandomResizedCrop/Flip at every entry point); here the
same augmentation family runs inside the training step: one batched
RandomResizedCrop + horizontal flip + normalize, driven by a jax PRNG key, so
raw full-resolution batches stream to HBM once and all per-step randomness is
device-side (no host PIL in the hot loop).

Sampler parity: the 10-candidate area/aspect draw with central-crop fallback
follows torchvision's get_params (utils/transforms.py:225-268) vectorized —
all 10 candidates are drawn at once and the first valid one is selected.
Resampling is bilinear (images) / nearest (labels) with half-pixel centers;
the host PIL path uses BICUBIC, so the two pipelines are statistically, not
bitwise, equivalent (both are exposed; the host path remains the parity path).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .resize import sample_bilinear_at

TRIES = 10


def _sample_crop_params(key: jax.Array, in_hw: Tuple[int, int],
                        scale: Tuple[float, float],
                        ratio: Tuple[float, float]):
    """Vectorized torchvision-style crop sampler for ONE sample.

    Returns (top, left, h, w) as f32 scalars.
    """
    H, W = in_hw
    area = float(H * W)
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)
    ta = area * jax.random.uniform(k_area, (TRIES,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k_ratio, (TRIES,), minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    ar = jnp.exp(log_r)
    w = jnp.round(jnp.sqrt(ta * ar))
    h = jnp.round(jnp.sqrt(ta / ar))
    valid = (w > 0) & (w <= W) & (h > 0) & (h <= H)
    idx = jnp.argmax(valid)                      # first valid candidate
    any_valid = jnp.any(valid)
    h_sel, w_sel = h[idx], w[idx]
    u_i = jax.random.uniform(k_i, ())
    u_j = jax.random.uniform(k_j, ())
    top = jnp.floor(u_i * (H - h_sel + 1.0))
    left = jnp.floor(u_j * (W - w_sel + 1.0))

    # central-crop fallback (in_ratio clamped into [min, max] ratio)
    in_ratio = W / H
    if in_ratio < min(ratio):
        fw, fh = float(W), round(W / min(ratio))
    elif in_ratio > max(ratio):
        fh, fw = float(H), round(H * max(ratio))
    else:
        fw, fh = float(W), float(H)
    f_top, f_left = (H - fh) // 2, (W - fw) // 2

    h_out = jnp.where(any_valid, h_sel, fh)
    w_out = jnp.where(any_valid, w_sel, fw)
    top = jnp.where(any_valid, top, f_top)
    left = jnp.where(any_valid, left, f_left)
    return top, left, h_out, w_out


def random_resized_crop_flip(key: jax.Array, images: jax.Array, *,
                             labels: Optional[jax.Array] = None,
                             out_hw: Tuple[int, int] = (256, 512),
                             scale: Tuple[float, float] = (0.5, 1.0),
                             ratio: Tuple[float, float] = (1.5, 8.0 / 3.0),
                             flip_p: float = 0.5,
                             mean: Optional[jax.Array] = None,
                             std: Optional[jax.Array] = None):
    """Batched device-side RandomResizedCrop + flip (+ normalize).

    images: (B, H, W, C) float; labels: optional (B, H, W) int.
    Returns (aug_images (B, oh, ow, C), aug_labels or None).
    """
    b, H, W, _ = images.shape
    oh, ow = out_hw
    keys = jax.random.split(key, b + 1)
    sample_keys, flip_key = keys[:b], keys[b]

    top, left, h, w = jax.vmap(
        lambda k: _sample_crop_params(k, (H, W), scale, ratio))(sample_keys)

    # half-pixel-center source coordinates of the (oh, ow) output inside the crop
    jr = (jnp.arange(oh) + 0.5)[None, :]
    jc = (jnp.arange(ow) + 0.5)[None, :]
    rows = top[:, None] + jr * (h[:, None] / oh) - 0.5
    cols = left[:, None] + jc * (w[:, None] / ow) - 0.5
    rows = jnp.clip(rows, 0.0, H - 1.0)
    cols = jnp.clip(cols, 0.0, W - 1.0)

    flip = jax.random.uniform(flip_key, (b,)) < flip_p
    cols = jnp.where(flip[:, None], cols[:, ::-1], cols)

    out = sample_bilinear_at(images, rows, cols)
    if mean is not None:
        out = (out - mean) / std

    out_labels = None
    if labels is not None:
        nr = jnp.clip(jnp.floor(top[:, None] + jr * (h[:, None] / oh)), 0, H - 1).astype(jnp.int32)
        nc = jnp.clip(jnp.floor(left[:, None] + jc * (w[:, None] / ow)), 0, W - 1).astype(jnp.int32)
        nc = jnp.where(flip[:, None], nc[:, ::-1], nc)
        # one-hot selection-matrix contraction instead of an index gather
        # (repo rule: TPU gathers at image shapes are ~30x slower than the
        # equivalent matmul; exact for integer labels < 2^24)
        mr = jax.nn.one_hot(nr, H, dtype=jnp.float32)   # (B, oh, H)
        mc = jax.nn.one_hot(nc, W, dtype=jnp.float32)   # (B, ow, W)
        lf = labels.astype(jnp.float32)
        sel = jnp.einsum("boh,bhw->bow", mr, lf, precision="highest",
                         preferred_element_type=jnp.float32)
        sel = jnp.einsum("bpw,bow->bop", mc, sel, precision="highest",
                         preferred_element_type=jnp.float32)
        out_labels = jnp.round(sel).astype(labels.dtype)
    return out, out_labels


def ir_window_normalize(raw: jax.Array, *, minval: float = 21800.0,
                        maxval: float = 25000.0) -> jax.Array:
    """Device-side Freiburg IR radiometric window (freiburg_dataset.py:72-82)."""
    x = jnp.clip(raw.astype(jnp.float32), minval, maxval)
    return (x - minval) / (maxval - minval)
