"""On-device confusion-matrix accumulation.

The reference accumulates predictions on the host per batch
(segmentation_evaluate.py:42-44 ``.cpu().numpy()`` each step) and histograms at
the end with ``np.bincount`` (utils/eval_tools.py:4-9). Here the histogram is
computed on-device per batch as a one-hot outer product — two (P, C) one-hot
matrices contracted on the MXU — and summed across steps (and across a data
mesh with ``psum``), so evaluation never syncs to the host inside the loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(pred: jax.Array, true: jax.Array, num_classes: int) -> jax.Array:
    """(num_classes, num_classes) hist with rows=ground truth, cols=prediction.

    Matches ``_fast_hist`` (utils/eval_tools.py:4-9): pixels with
    ``0 <= true < num_classes`` contribute; everything else is dropped.
    ``pred`` is assumed in-range (it is an argmax over num_classes logits).
    """
    pred = pred.reshape(-1)
    true = true.reshape(-1)
    mask = (true >= 0) & (true < num_classes)
    t = jnp.where(mask, true, 0)
    oh_true = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
    oh_true = oh_true * mask[:, None].astype(jnp.float32)
    oh_pred = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    hist = jnp.einsum("pt,pc->tc", oh_true, oh_pred, preferred_element_type=jnp.float32)
    return hist
