"""Resize ops with exact PyTorch semantics, implemented MXU-first.

The reference upsamples logits with ``torch.nn.Upsample(mode='bilinear',
align_corners=True)`` at every loss/eval site (segmentation_train.py:46,
segmentation_evaluate.py:39, self_training.py:53-77). Exact parity here gates the
whole metric path, so instead of gather-based interpolation we build separable
1-D interpolation matrices and contract them with ``jnp.einsum`` — two small
matmuls that XLA tiles straight onto the MXU and fuses with neighbouring ops.

All ops take NHWC (TPU-native layout) unless stated otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) linear-interpolation matrix (float32).

    align_corners=True: src = i * (in-1)/(out-1)   (PyTorch/PIL corner-aligned)
    align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped.
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = i * scale
    else:
        scale = in_size / out_size
        src = np.clip((i + 0.5) * scale - 0.5, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    m[rows, lo] += 1.0 - w_hi
    m[rows, hi] += w_hi
    return m


def resize_bilinear(x: jax.Array, out_h: int, out_w: int, *, align_corners: bool = True) -> jax.Array:
    """Bilinearly resize NHWC ``x`` to (out_h, out_w).

    Matches ``F.interpolate(x, (out_h, out_w), mode='bilinear', align_corners=...)``
    bit-for-bit in float32 up to matmul reassociation.
    """
    n, h, w, c = x.shape
    mh = jnp.asarray(_interp_matrix_np(h, out_h, align_corners))
    mw = jnp.asarray(_interp_matrix_np(w, out_w, align_corners))
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # (N,H,W,C) -> (N,out_h,W,C): contract H with mh. precision='highest' keeps
    # fp32 accumulation on the MXU; the 2-nonzero-per-row matrices are tiny next
    # to the surrounding convs, and loss/metric positioning depends on exactness.
    y = jnp.einsum("oh,nhwc->nowc", mh, xf, precision="highest",
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,nowc->nopc", mw, y, precision="highest",
                   preferred_element_type=jnp.float32)
    return y.astype(orig_dtype)


@functools.lru_cache(maxsize=128)
def _nearest_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """0/1 selection matrix for torch-'nearest' resize: src = floor(i*in/out)."""
    src = np.clip(np.floor(np.arange(out_size) * (in_size / out_size)), 0,
                  in_size - 1).astype(np.int64)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), src] = 1.0
    return m


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest resize of NHWC ``x`` matching torch ``F.interpolate(mode='nearest')``.

    torch 'nearest' picks src = floor(i * in/out). Used for hard pseudo-label
    resizing (self_training.py:103). Implemented as two 0/1 selection-matrix
    contractions rather than index gathers — TPU gathers at image shapes are
    ~30x slower than the equivalent matmul.
    """
    n, h, w, c = x.shape
    mh = jnp.asarray(_nearest_matrix_np(h, out_h))
    mw = jnp.asarray(_nearest_matrix_np(w, out_w))
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = jnp.einsum("oh,nhwc->nowc", mh, xf, precision="highest",
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,nowc->nopc", mw, y, precision="highest",
                   preferred_element_type=jnp.float32)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        y = jnp.round(y)
    return y.astype(orig_dtype)


def upsample_logits(logits_nhwc: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """The reference's canonical logits upsample: bilinear, align_corners=True."""
    return resize_bilinear(logits_nhwc, out_h, out_w, align_corners=True)


def sample_bilinear_at(x: jax.Array, src_rows: jax.Array, src_cols: jax.Array) -> jax.Array:
    """Per-sample separable bilinear sampling at fractional coordinates.

    Args:
      x: (N, H, W, C) features.
      src_rows: (N, out_h) fractional row coordinates into H (already clamped range).
      src_cols: (N, out_w) fractional col coordinates into W.

    Returns (N, out_h, out_w, C). This is the vectorized replacement for the
    reference's per-sample ``full2weak`` loop (self_training.py:145-158): an
    align_corners resize followed by a crop/flip is exactly a bilinear sample
    at affine per-sample coordinates. Implemented as two batched contractions
    with per-sample 2-nonzero interpolation matrices (built from one-hots) —
    no index gathers, which are ~30x slower than matmuls on TPU at image sizes.
    """
    n, h, w, c = x.shape

    def interp_matrix(src, size):
        """(N, out) fractional coords -> (N, out, size) interpolation weights."""
        lo = jnp.clip(jnp.floor(src), 0, size - 1).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        whi = (src - lo).astype(jnp.float32)
        return (jax.nn.one_hot(lo, size, dtype=jnp.float32) * (1.0 - whi)[..., None]
                + jax.nn.one_hot(hi, size, dtype=jnp.float32) * whi[..., None])

    mr = interp_matrix(src_rows, h)   # (N, oh, H)
    mc = interp_matrix(src_cols, w)   # (N, ow, W)
    xf = x.astype(jnp.float32)
    y = jnp.einsum("boh,bhwc->bowc", mr, xf, precision="highest",
                   preferred_element_type=jnp.float32)
    return jnp.einsum("bpw,bowc->bopc", mc, y, precision="highest",
                      preferred_element_type=jnp.float32)
