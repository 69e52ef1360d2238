"""Metric parity: on-device confusion matrix + evaluate() vs reference formulas."""

import numpy as np
import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.ops.confmat import confusion_matrix
from thermal_semantic_segmentation_tpu.eval.metrics import evaluate, scores_from_hist


def _np_fast_hist(pred, true, n):
    mask = (true >= 0) & (true < n)
    return np.bincount(n * true[mask].astype(int) + pred[mask], minlength=n ** 2).reshape(n, n)


def test_confmat_matches_bincount():
    rng = np.random.default_rng(0)
    true = rng.integers(0, 14, size=(4, 33, 65))  # includes out-of-range 13
    pred = rng.integers(0, 13, size=(4, 33, 65))
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(true), 13))
    want = _np_fast_hist(pred.reshape(-1), true.reshape(-1), 13)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_confmat_jittable_and_additive():
    rng = np.random.default_rng(1)
    f = jax.jit(confusion_matrix, static_argnums=2)
    total = np.zeros((13, 13))
    preds, trues = [], []
    for i in range(3):
        t = rng.integers(0, 13, size=(2, 16, 16))
        p = rng.integers(0, 13, size=(2, 16, 16))
        preds.append(p); trues.append(t)
        total += np.asarray(f(jnp.asarray(p), jnp.asarray(t), 13))
    want = sum(_np_fast_hist(p.reshape(-1), t.reshape(-1), 13) for p, t in zip(preds, trues))
    np.testing.assert_array_equal(total.astype(np.int64), want)


def test_evaluate_freiburg_miou_excludes_class_11_and_12():
    """The 13-class mIoU must be nanmean over classes 0..10 (eval_tools.py:57-59)."""
    n = 13
    # Perfect predictions for classes 0..10; garbage for 11.
    true = np.concatenate([np.full(100, c) for c in range(12)])
    pred = true.copy()
    pred[true == 11] = 0  # class 11 fully wrong
    acc, acc_cls, mean_iu, fwavacc, cls_iu = evaluate([pred], [true], n)
    assert mean_iu != 1.0  # class 0 IoU is diluted by the wrong class-11 pixels
    # class 11 wrongness must NOT enter through iu[11]:
    iu0 = 100 / 200  # class 0: 100 correct, 100 false positives
    want = (iu0 + 10 * 1.0) / 11
    np.testing.assert_allclose(mean_iu, want, rtol=1e-12)
    assert "IoU motorcycle,bicycle" in cls_iu


def test_evaluate_matches_manual_formula():
    rng = np.random.default_rng(2)
    true = rng.integers(0, 13, size=5000)
    pred = rng.integers(0, 13, size=5000)
    acc, acc_cls, mean_iu, fwavacc, cls_iu = evaluate([pred], [true], 13)
    hist = _np_fast_hist(pred, true, 13).astype(np.float64)
    np.testing.assert_allclose(acc, np.diag(hist).sum() / hist.sum())
    iu = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
    np.testing.assert_allclose(mean_iu, np.nanmean(iu[:11]))
    freq = hist.sum(1) / hist.sum()
    np.testing.assert_allclose(fwavacc, (freq[freq > 0] * iu[freq > 0]).sum())


def test_scores_from_hist_cityscapes_19():
    hist = np.eye(19) * 10
    s = scores_from_hist(hist)
    assert s.mean_iu == 1.0 and s.acc == 1.0
    assert len(s.cls_iu) == 19
