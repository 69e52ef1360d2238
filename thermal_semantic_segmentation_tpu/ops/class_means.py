"""Masked per-class feature means + sequential prototype folding.

Replaces the reference's per-(sample, class) Python double loop with host
syncs (cal_prototype.py:131-144, self_training.py:176-202) by one one-hot
matmul on the MXU plus an in-graph lax.scan fold, so prototype maintenance
never leaves the device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def masked_class_means(feat: jax.Array, outputs: jax.Array, *,
                       num_classes: int, thresh: Optional[float] = None,
                       labels: Optional[jax.Array] = None,
                       min_pixels: int = 10) -> Tuple[jax.Array, jax.Array]:
    """Per-sample per-class masked means of ``feat`` over predicted regions.

    feat: (N, H, W, F); outputs: (N, H, W, C) logits (same H, W).
    labels: optional (N, H, W) ground truth; when given, a pixel counts only
    if prediction AND label agree on the class (reference ``labels_expanded *
    outputs_argmax``).

    Returns (vectors (N, C, F) float32, valid (N, C) bool) where valid applies
    the reference's rules: masked count > 0 and unmasked predicted-pixel count
    >= min_pixels (cal_prototype.py:133-135).
    """
    n, h, w, c = outputs.shape
    probs = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)
    pred = jnp.argmax(probs, axis=-1)
    onehot = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)     # (N,H,W,C)
    if labels is not None:
        onehot = onehot * jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if thresh is None or thresh < 0:
        mask = jnp.ones((n, h, w, 1), jnp.float32)
    else:
        conf = jnp.max(probs, axis=-1, keepdims=True)
        mask = (conf >= thresh).astype(jnp.float32)

    masked_onehot = onehot * mask
    flat_feat = feat.astype(jnp.float32).reshape(n, h * w, -1)
    flat_onehot = masked_onehot.reshape(n, h * w, num_classes)
    sums = jnp.einsum("npc,npf->ncf", flat_onehot, flat_feat,
                      preferred_element_type=jnp.float32)
    cnt_masked = jnp.sum(flat_onehot, axis=1)                          # (N,C)
    cnt_unmasked = jnp.sum(onehot.reshape(n, h * w, num_classes), axis=1)
    vectors = sums / jnp.maximum(cnt_masked, 1.0)[..., None]
    valid = (cnt_masked > 0) & (cnt_unmasked >= min_pixels)
    return vectors, valid


MAX_PROTOTYPE_COUNT = 3000.0  # cal_prototype.py:93 momentum-regime cap —
# the single source for every fold/merge that must respect the saturation


def fold_prototypes(prototypes: jax.Array, counts: jax.Array,
                    vectors: jax.Array, valid: jax.Array, *,
                    momentum: float = 1e-4, mode: str = "moving_average",
                    start_mean: bool = True,
                    max_count: float = MAX_PROTOTYPE_COUNT,
                    ) -> Tuple[jax.Array, jax.Array]:
    """Sequentially fold (N, C, F) class vectors into (C, F) prototypes.

    Exactly reproduces update_objective_SingleVector semantics
    (self_training.py:211-227 / cal_prototype.py:153-169) in reference order
    (sample-major, class-minor), as an in-graph lax.scan:
      mean:           p = (p * n + v) / (n + 1)
      moving_average: p = p * (1 - momentum) + momentum * v
      start_mean:     use 'mean' while the class count is < 100
    Skips invalid entries and all-zero vectors. Counts saturate at max_count.
    """
    n, c, f = vectors.shape
    flat_v = vectors.reshape(n * c, f)
    flat_ok = valid.reshape(n * c)
    class_ids = jnp.tile(jnp.arange(c), n)

    def body(carry, x):
        protos, nums = carry
        v, ok, cid = x
        ok = ok & (jnp.sum(v) != 0.0)
        num = nums[cid]
        use_mean = (mode == "mean") | (start_mean & (num < 100.0))
        p_old = protos[cid]
        p_mean = (p_old * num + v) / (num + 1.0)
        p_ma = p_old * (1.0 - momentum) + momentum * v
        p_new = jnp.where(use_mean, p_mean, p_ma)
        protos = protos.at[cid].set(jnp.where(ok, p_new, p_old))
        nums = nums.at[cid].set(jnp.where(ok, jnp.minimum(num + 1.0, max_count), num))
        return (protos, nums), None

    (protos, nums), _ = jax.lax.scan(
        body, (prototypes.astype(jnp.float32), counts.astype(jnp.float32)),
        (flat_v, flat_ok, class_ids))
    return protos, nums
