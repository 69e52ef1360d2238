"""Self-training machinery: class means, prototype folds, full2weak inverse,
prototype weights, and a full jitted step smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab
from thermal_semantic_segmentation_tpu.ops.class_means import (
    fold_prototypes, masked_class_means)
from thermal_semantic_segmentation_tpu.ops.resize import resize_bilinear, sample_bilinear_at
from thermal_semantic_segmentation_tpu.train.self_train import (
    create_self_train_state, full2weak_coords, make_self_train_step,
    prototype_weights)

C = 5   # classes for unit tests
F = 7   # feature dim


def _reference_class_means(feat, outputs, num_classes, min_pixels=10):
    """Straight numpy transcription of the reference semantics
    (cal_prototype.py:118-144) as an oracle."""
    n, h, w, _ = outputs.shape
    probs = np.exp(outputs) / np.exp(outputs).sum(-1, keepdims=True)
    pred = probs.argmax(-1)
    vectors, valid = np.zeros((n, num_classes, feat.shape[-1])), np.zeros((n, num_classes), bool)
    for b in range(n):
        for t in range(num_classes):
            m = pred[b] == t
            if m.sum() == 0 or m.sum() < min_pixels:
                continue
            vectors[b, t] = feat[b][m].mean(0)
            valid[b, t] = True
    return vectors, valid


def test_masked_class_means_matches_loop():
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((2, 8, 12, F)).astype(np.float32)
    outputs = rng.standard_normal((2, 8, 12, C)).astype(np.float32) * 3
    got_v, got_ok = masked_class_means(jnp.asarray(feat), jnp.asarray(outputs),
                                       num_classes=C)
    want_v, want_ok = _reference_class_means(feat, outputs, C)
    np.testing.assert_array_equal(np.asarray(got_ok), want_ok)
    np.testing.assert_allclose(np.asarray(got_v)[want_ok], want_v[want_ok],
                               rtol=1e-4, atol=1e-5)


def test_fold_prototypes_mean_mode():
    """'mean' mode must equal a running average in reference order."""
    rng = np.random.default_rng(1)
    vectors = rng.standard_normal((3, C, F)).astype(np.float32)
    valid = rng.uniform(size=(3, C)) > 0.3
    protos = jnp.zeros((C, F))
    counts = jnp.zeros((C,))
    protos, counts = fold_prototypes(protos, counts, jnp.asarray(vectors),
                                     jnp.asarray(valid), mode="mean")
    # oracle
    want = np.zeros((C, F)); num = np.zeros(C)
    for b in range(3):
        for t in range(C):
            if not valid[b, t] or vectors[b, t].sum() == 0:
                continue
            want[t] = (want[t] * num[t] + vectors[b, t]) / (num[t] + 1)
            num[t] += 1
    np.testing.assert_allclose(np.asarray(protos), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(counts), num)


def test_fold_prototypes_moving_average():
    rng = np.random.default_rng(2)
    vectors = rng.standard_normal((1, C, F)).astype(np.float32)
    valid = np.ones((1, C), bool)
    protos0 = rng.standard_normal((C, F)).astype(np.float32)
    counts0 = np.full((C,), 200.0, np.float32)  # past start_mean threshold
    protos, counts = fold_prototypes(jnp.asarray(protos0), jnp.asarray(counts0),
                                     jnp.asarray(vectors), jnp.asarray(valid),
                                     momentum=1e-4, mode="moving_average",
                                     start_mean=False)
    want = protos0 * (1 - 1e-4) + 1e-4 * vectors[0]
    np.testing.assert_allclose(np.asarray(protos), want, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts), counts0 + 1)


def test_full2weak_matches_resize_crop_flip():
    """Batched coordinate sampling == reference per-sample
    resize -> crop -> flip composition (self_training.py:145-158)."""
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((2, 80, 175, 4)).astype(np.float32)
    oh, ow = 64, 128
    resized_hw = np.array([[1000 // 4 * 4, 1400], [800, 1100]], np.int32)  # (h, w)
    crop = np.array([[40, 40 + 256, 100, 100 + 512],
                     [8, 8 + 256, 52, 52 + 512]], np.int32)
    flip = np.array([False, True])

    rows, cols = full2weak_coords(
        {"resized_hw": jnp.asarray(resized_hw), "crop": jnp.asarray(crop),
         "flip": jnp.asarray(flip)}, feat_hw=(80, 175), out_hw=(oh, ow))
    got = np.asarray(sample_bilinear_at(jnp.asarray(feat), rows, cols))

    for b in range(2):
        h4, w4 = resized_hw[b, 0] // 4, resized_hw[b, 1] // 4
        y1, x1 = crop[b, 0] // 4, crop[b, 2] // 4
        resized = np.asarray(resize_bilinear(jnp.asarray(feat[b:b + 1]), h4, w4))
        want = resized[0, y1:y1 + oh, x1:x1 + ow]
        if flip[b]:
            want = want[:, ::-1]
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_prototype_weights_properties():
    rng = np.random.default_rng(4)
    feat = rng.standard_normal((1, 4, 6, F)).astype(np.float32)
    protos = rng.standard_normal((C, F)).astype(np.float32)
    w = np.asarray(prototype_weights(jnp.asarray(feat), jnp.asarray(protos), 0.5))
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    # nearest prototype gets the highest weight
    d = np.linalg.norm(feat[0, :, :, None, :] - protos[None, None], axis=-1)
    np.testing.assert_array_equal(w.argmax(-1)[0], d.argmin(-1))


@pytest.mark.slow
def test_self_train_step_end_to_end():
    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(64, 128))
    rng = np.random.default_rng(0)
    state = create_self_train_state(
        model, variables, prototypes=rng.standard_normal((13, 256)) * 0.1,
        learning_rate=1e-4)
    step = make_self_train_step(model, num_classes=13, ignore_index=12,
                                base_lr=1e-4, train_thred=0.1,
                                label_hw=(64, 128))
    B = 2
    batch = dict(
        source_image=jnp.asarray(rng.uniform(0, 1, (B, 64, 128, 1)).astype(np.float32)),
        source_label=jnp.asarray(rng.integers(0, 13, (B, 64, 128))),
        target_image=jnp.asarray(rng.uniform(0, 1, (B, 64, 128, 1)).astype(np.float32)),
        target_image_full=jnp.asarray(rng.uniform(0, 1, (B, 80, 176, 1)).astype(np.float32)),
        target_lp_soft=jnp.asarray(rng.uniform(0, 1, (B, 13, 64, 128)).astype(np.float32)),
        target_lp_hard=jnp.asarray(rng.integers(0, 13, (B, 64, 128))),
        weak_params={"resized_hw": jnp.asarray([[96, 160], [120, 200]]),
                     "crop": jnp.asarray([[8, 8 + 64, 16, 16 + 128],
                                          [4, 4 + 64, 8, 8 + 128]]),
                     "flip": jnp.asarray([True, False])},
    )
    protos_before = np.asarray(state.prototypes)
    ema_before = jax.tree.map(np.asarray, state.ema_params)
    state, loss_pseudo, loss_source = step(state, **batch)
    assert np.isfinite(float(loss_pseudo)) and np.isfinite(float(loss_source))
    assert int(state.step) == 1
    # prototypes moved, EMA moved toward the student
    assert not np.allclose(np.asarray(state.prototypes), protos_before)
    leaf_new = jax.tree.leaves(state.ema_params)[0]
    leaf_old = jax.tree.leaves(ema_before)[0]
    assert not np.allclose(np.asarray(leaf_new), leaf_old)
    # second step reuses the compiled fn
    state, lp2, ls2 = step(state, **batch)
    assert np.isfinite(float(lp2))


@pytest.mark.slow
def test_fused_student_matches_sequential():
    """The vmapped dual-domain student pass (fused_student=True, the default)
    is semantically identical to the reference's two sequential passes:
    same losses, same updated params/batch-stats (per-domain BN statistics,
    same per-domain dropout keys, closed-form sequential running-stats fold).
    """
    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(64, 128))
    rng = np.random.default_rng(1)
    batch = dict(
        source_image=jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 1)).astype(np.float32)),
        source_label=jnp.asarray(rng.integers(0, 13, (2, 64, 128))),
        target_image=jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 1)).astype(np.float32)),
        target_image_full=jnp.asarray(rng.uniform(0, 1, (2, 80, 176, 1)).astype(np.float32)),
        target_lp_soft=jnp.asarray(rng.uniform(0, 1, (2, 13, 64, 128)).astype(np.float32)),
        target_lp_hard=jnp.asarray(rng.integers(0, 13, (2, 64, 128))),
        weak_params={"resized_hw": jnp.asarray([[96, 160], [120, 200]]),
                     "crop": jnp.asarray([[8, 72, 16, 144], [4, 68, 8, 136]]),
                     "flip": jnp.asarray([True, False])},
    )
    results = {}
    for fused in (False, True):
        state = create_self_train_state(
            model, jax.tree.map(jnp.array, variables),  # donation-safe copy
            prototypes=np.random.default_rng(2).standard_normal((13, 256)) * 0.1,
            learning_rate=1e-4)
        step = make_self_train_step(model, num_classes=13, ignore_index=12,
                                    base_lr=1e-4, train_thred=0.1,
                                    label_hw=(64, 128), fused_student=fused)
        state, lp, ls = step(state, **{k: (jax.tree.map(jnp.array, v)
                                           if isinstance(v, dict) else jnp.array(v))
                                       for k, v in batch.items()})
        results[fused] = (float(lp), float(ls),
                          jax.tree.map(np.asarray, state.params),
                          jax.tree.map(np.asarray, state.batch_stats))
    np.testing.assert_allclose(results[True][0], results[False][0], rtol=2e-5)
    np.testing.assert_allclose(results[True][1], results[False][1], rtol=2e-5)
    for a, b in zip(jax.tree.leaves(results[True][3]),
                    jax.tree.leaves(results[False][3])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(results[True][2]),
                    jax.tree.leaves(results[False][2])):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-6)
