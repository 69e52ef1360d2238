"""Loss functions (functional, jit-friendly).

Covers the reference loss inventory (utils/loss.py, self_training.py:167-174):
LSGAN / vanilla / Wasserstein GAN losses, L1 cycle/identity/contour, pixel CE
with ignore_index, CyCADA semantic consistency, focal loss, and the symmetric
reverse cross entropy used by self-training.

All segmentation losses take NHWC logits and (N, H, W) integer labels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array, *,
                  ignore_index: int = 255) -> jax.Array:
    """Mean CE over non-ignored pixels (torch CrossEntropyLoss parity).

    logits: (N, H, W, C); labels: (N, H, W) int. Pixels whose label equals
    ``ignore_index`` (or falls outside [0, C)) contribute nothing.
    """
    num_classes = logits.shape[-1]
    valid = (labels != ignore_index) & (labels >= 0) & (labels < num_classes)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot select instead of take_along_axis: TPU gathers at this shape cost
    # ~34 ms/step (as much as the whole ResNet-101 forward); the one-hot
    # multiply-reduce fuses into the softmax epilogue for free.
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    # max(count, 1): an all-ignored batch must yield 0 loss with ZERO grads —
    # where(count > 0, sum/count, 0) still backprops 0 * d(sum/0) = NaN
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def reverse_cross_entropy(logits: jax.Array, labels: jax.Array, *,
                          num_classes: int, ignore_index: int) -> jax.Array:
    """Symmetric reverse CE (self_training.py:167-174).

    rce = -mean_over_valid( sum_c p_c * log(clip(onehot_c, 1e-4, 1)) )
    with p = clip(softmax(logits), 1e-7, 1).
    """
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.clip(p, 1e-7, 1.0)
    mask = (labels != ignore_index).astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, num_classes + 1)[..., :num_classes]
    onehot = jnp.clip(onehot, 1e-4, 1.0)
    per_pix = -jnp.sum(p * jnp.log(onehot), axis=-1)
    return jnp.sum(per_pix * mask) / (jnp.sum(mask) + 1e-6)


def focal_loss(logits: jax.Array, labels: jax.Array, *, gamma: float = 0.0,
               alpha: Optional[jax.Array] = None,
               ignore_index: Optional[int] = None) -> jax.Array:
    """Focal loss (utils/loss.py:153-184) with optional ignore handling."""
    num_classes = logits.shape[-1]
    valid = jnp.ones(labels.shape, bool) if ignore_index is None else (labels != ignore_index)
    valid &= (labels >= 0) & (labels < num_classes)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=logp.dtype)
    logpt = jnp.sum(logp * onehot, axis=-1)  # gather-free (see cross_entropy)
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    if alpha is not None:
        logpt = logpt * jnp.sum(jnp.asarray(alpha) * onehot, axis=-1)
    loss = -((1.0 - pt) ** gamma) * logpt
    loss = jnp.where(valid, loss, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)  # NaN-free backward (see cross_entropy)
    return jnp.sum(loss) / count


def semantic_consistency(logits: jax.Array, labels: jax.Array, *,
                         ignore_classes: Sequence[int] = ()) -> jax.Array:
    """CyCADA semantic-consistency loss (utils/loss.py:102-150): CE with the
    given class ids remapped to ignore (255)."""
    remapped = labels
    for cid in ignore_classes:
        remapped = jnp.where(remapped == cid, 255, remapped)
    return cross_entropy(logits, remapped, ignore_index=255)


def lsgan_loss(prediction: jax.Array, real: bool) -> jax.Array:
    """Least-squares GAN loss: MSE against all-ones / all-zeros."""
    target = 1.0 if real else 0.0
    p = prediction.astype(jnp.float32)
    return jnp.mean((p - target) ** 2)


def vanilla_gan_loss(prediction: jax.Array, real: bool) -> jax.Array:
    """BCE-with-logits against all-ones / all-zeros."""
    p = prediction.astype(jnp.float32)
    z = 1.0 if real else 0.0
    # stable bce-with-logits: max(p,0) - p*z + log(1+exp(-|p|))
    return jnp.mean(jnp.maximum(p, 0) - p * z + jnp.log1p(jnp.exp(-jnp.abs(p))))


def wasserstein_gan_loss(prediction: jax.Array, real: bool) -> jax.Array:
    p = prediction.astype(jnp.float32)
    return -jnp.mean(p) if real else jnp.mean(p)


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


GAN_LOSSES = {
    "lsgan": lsgan_loss,
    "vanilla": vanilla_gan_loss,
    "wgan": wasserstein_gan_loss,
}
