"""Pallas TPU kernels for the eval/pseudo-label hot path.

``upsample_argmax``: fused bilinear align-corners upsample + per-pixel argmax
(+ online-softmax confidence), keeping everything in VMEM — the stride-8
logits tile is ~100 KB — streaming one class plane at a time through two
small MXU matmuls with running max/argmax/sum-exp accumulators, writing only
the (N, out_h, out_w) prediction and confidence maps.

Measured on TPU v5e (batch 16, 33x65x13 -> 256x512): 1.26 ms vs 1.08 ms for
the jnp resize+argmax+softmax composite — XLA's own fusion already avoids the
HBM round-trip here, so the composite remains the default production path and
this kernel stands as the hand-scheduled alternative (bit-exact argmax parity,
confidence within 7e-5). Lesson recorded: don't hand-schedule what XLA
already fuses; spend Pallas on ops XLA can't express.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resize import _interp_matrix_np

_NEG = -1e30


def _kernel(x_ref, mh_ref, mwt_ref, pred_ref, conf_ref, *, num_classes: int):
    """x: (1, H, W, C) logits; mh: (TILE, H); mwt: (W, OW).
    pred/conf: (1, TILE, OW)."""
    mh = mh_ref[:]
    mwt = mwt_ref[:]
    tile, ow = pred_ref.shape[1], pred_ref.shape[2]

    best = jnp.full((tile, ow), _NEG, jnp.float32)
    besti = jnp.zeros((tile, ow), jnp.int32)
    # online softmax accumulators (for the confidence map)
    run_max = jnp.full((tile, ow), _NEG, jnp.float32)
    run_sum = jnp.zeros((tile, ow), jnp.float32)

    for c in range(num_classes):  # static unroll: 2 small matmuls per class
        plane = x_ref[0, :, :, c].astype(jnp.float32)              # (H, W)
        # precision='highest' keeps fp32 MXU passes: near-tie argmax decisions
        # must match the fp32 XLA eval path bit-for-bit.
        rows = jnp.dot(mh, plane, precision="highest",
                       preferred_element_type=jnp.float32)              # (T, W)
        up = jnp.dot(rows, mwt, precision="highest",
                     preferred_element_type=jnp.float32)                # (T, OW)
        is_new = up > best
        besti = jnp.where(is_new, c, besti)
        best = jnp.maximum(best, up)
        new_max = jnp.maximum(run_max, up)
        run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.exp(up - new_max)
        run_max = new_max

    pred_ref[0] = besti
    conf_ref[0] = jnp.exp(best - (run_max + jnp.log(run_sum)))


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "tile_h", "interpret"))
def upsample_argmax(logits: jax.Array, out_h: int, out_w: int, *,
                    tile_h: int = 64, interpret: bool = False):
    """(N, h, w, C) stride-8 logits -> (pred (N, out_h, out_w) int32,
    conf (N, out_h, out_w) f32 softmax confidence), bilinear align_corners.

    Equivalent to argmax/max-softmax over ``resize_bilinear(logits, ...)``
    without ever writing the upsampled logits to HBM.
    """
    n, h, w, c = logits.shape
    assert out_h % tile_h == 0, (out_h, tile_h)
    mh = jnp.asarray(_interp_matrix_np(h, out_h, True))        # (out_h, h)
    mwt = jnp.asarray(_interp_matrix_np(w, out_w, True).T)     # (w, out_w)

    grid = (n, out_h // tile_h)
    pred, conf = pl.pallas_call(
        functools.partial(_kernel, num_classes=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, h), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, out_w), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, tile_h, out_w), lambda i, t: (i, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, out_h, out_w), jnp.int32),
            jax.ShapeDtypeStruct((n, out_h, out_w), jnp.float32),
        ],
        interpret=interpret,
    )(logits.astype(jnp.float32), mh, mwt)
    return pred, conf
