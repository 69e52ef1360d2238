"""Loss parity vs torch oracles + property checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.losses import (
    cross_entropy, focal_loss, l1_loss, lsgan_loss, reverse_cross_entropy,
    semantic_consistency, vanilla_gan_loss, wasserstein_gan_loss)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _logits_labels(seed=0, b=2, h=8, w=12, c=13, ignore=12):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32) * 2
    labels = rng.integers(0, c, (b, h, w)).astype(np.int64)
    labels[0, 0, :3] = ignore
    return logits, labels


def test_cross_entropy_matches_torch():
    logits, labels = _logits_labels()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                              ignore_index=12))
    want = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                           torch.from_numpy(labels), ignore_index=12).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_all_ignored_is_zero():
    logits, labels = _logits_labels()
    labels[:] = 12
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                              ignore_index=12))
    assert got == 0.0  # torch returns nan here; we define 0 (documented)


def test_cross_entropy_all_ignored_backward_is_nan_free():
    """where(count>0, sum/count, 0) still backprops 0 * d(sum/0) = NaN; the
    safe-denominator form must give exactly-zero grads on all-ignored
    batches (an all-255 crop poisons every parameter otherwise)."""
    logits, labels = _logits_labels()
    labels[:] = 12
    g = jax.grad(lambda lg: cross_entropy(lg, jnp.asarray(labels),
                                          ignore_index=12))(jnp.asarray(logits))
    assert not bool(jnp.isnan(g).any())
    assert float(jnp.abs(g).max()) == 0.0


def test_focal_loss_gamma0_equals_ce_no_ignore():
    logits, labels = _logits_labels(seed=1)
    labels = np.clip(labels, 0, 11)  # no ignored pixels
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=0.0))
    want = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                           torch.from_numpy(labels)).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_matches_reference_formula():
    logits, labels = _logits_labels(seed=2)
    labels = np.clip(labels, 0, 11)
    gamma = 2.0
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=gamma))
    # reference formula (utils/loss.py:164-184)
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tt = torch.from_numpy(labels)
    logpt = F.log_softmax(lt, dim=1).gather(
        1, tt.unsqueeze(1)).view(-1)
    pt = logpt.exp()
    want = (-1 * (1 - pt) ** gamma * logpt).mean().item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_reverse_cross_entropy_matches_reference_formula():
    logits, labels = _logits_labels(seed=3)
    nc, ign = 13, 12
    got = float(reverse_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                      num_classes=nc, ignore_index=ign))
    # torch transcription of self_training.py:167-174
    pred = torch.clamp(F.softmax(torch.from_numpy(logits).permute(0, 3, 1, 2), 1),
                       1e-7, 1.0)
    lab = torch.from_numpy(labels)
    mask = (lab != ign).float()
    onehot = torch.clamp(
        F.one_hot(lab, nc + 1).float().permute(0, 3, 1, 2)[:, :-1], 1e-4, 1.0)
    want = (-(pred * onehot.log()).sum(1) * mask).sum() / (mask.sum() + 1e-6)
    np.testing.assert_allclose(got, want.item(), rtol=1e-5)


def test_semantic_consistency_remaps_ignore_classes():
    logits, labels = _logits_labels(seed=4)
    labels = np.clip(labels, 0, 11)
    # remapping class 5 to ignore must equal CE with 5 masked out
    got = float(semantic_consistency(jnp.asarray(logits), jnp.asarray(labels),
                                     ignore_classes=(5,)))
    lab = labels.copy()
    lab[lab == 5] = 255
    want = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                           torch.from_numpy(lab), ignore_index=255).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gan_losses_match_torch():
    rng = np.random.default_rng(5)
    pred = rng.standard_normal((2, 6, 6, 1)).astype(np.float32)
    pt = torch.from_numpy(pred)
    np.testing.assert_allclose(
        float(lsgan_loss(jnp.asarray(pred), True)),
        F.mse_loss(pt, torch.ones_like(pt)).item(), rtol=1e-6)
    np.testing.assert_allclose(
        float(lsgan_loss(jnp.asarray(pred), False)),
        F.mse_loss(pt, torch.zeros_like(pt)).item(), rtol=1e-6)
    np.testing.assert_allclose(
        float(vanilla_gan_loss(jnp.asarray(pred), True)),
        F.binary_cross_entropy_with_logits(pt, torch.ones_like(pt)).item(),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(wasserstein_gan_loss(jnp.asarray(pred), True)),
        (-pt.mean()).item(), rtol=1e-6)
    np.testing.assert_allclose(
        float(l1_loss(jnp.asarray(pred), jnp.asarray(pred * 0.5))),
        F.l1_loss(pt, pt * 0.5).item(), rtol=1e-6)
