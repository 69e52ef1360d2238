"""Synthetic convergence gate — CPU-affordable slice.

Quantitative "the framework can actually train" evidence at CPU scale:
train the real seg step on fixed batches from a learnable-by-construction
tree (labels are a function of pixel intensity,
tests/synthetic.make_learnable_freiburg_tree) until CE collapses, then score
the SAME images through the REAL evaluation protocol (seg_validate:
align-corners logits upsample -> argmax -> confusion matrix ->
nanmean(iu[:11]), /root/reference/segmentation_evaluate.py:24-80 +
eval_tools.py:57-59) and assert high mIoU.

The full-resolution GENERALIZATION gate (train with the real
RandomResizedCrop pipeline, score held-out test images, assert mIoU >= 0.9)
needs ~2500 steps and runs on the chip: ``python bench_all.py convergence``
(writes CONVERGENCE.json; measured 0.93) and
``recipes/convergence_gate.sh``. On this suite's single-core simulated mesh
a step costs ~3 s, so the CPU slice proves the machinery (data pipeline,
train step, BN stats, eval protocol, metric code) with ~80 steps instead.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.synthetic import make_learnable_freiburg_tree
from thermal_semantic_segmentation_tpu.data import transforms as T
from thermal_semantic_segmentation_tpu.data.freiburg import Freiburg
from thermal_semantic_segmentation_tpu.data.loader import DataLoader
from thermal_semantic_segmentation_tpu.eval.validate import seg_validate
from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab
from thermal_semantic_segmentation_tpu.train.seg import (
    create_seg_state,
    make_seg_train_step,
)

HW = (64, 128)


@pytest.mark.slow
def test_seg_train_learns_learnable_tree_to_high_miou(tmp_path):
    root = make_learnable_freiburg_tree(str(tmp_path / "freiburg"),
                                        n_train=8, n_test=2, seed=3,
                                        n_bands=3)
    tf = T.Compose([T.Resize((HW[1], HW[0])), T.ToArray()])
    ds = Freiburg(root, "train", "IR", transforms=tf, with_label=True)
    rng = np.random.default_rng(0)
    samples = [ds.get(i, rng) for i in range(8)]
    batches = [
        (jnp.asarray(np.stack([s["image"] for s in samples[k:k + 4]])),
         jnp.asarray(np.stack([s["label"] for s in samples[k:k + 4]])))
        for k in (0, 4)
    ]

    model, variables = create_deeplab(
        jax.random.key(0), num_classes=13, num_channels=1,
        layers=(1, 1, 1, 1), image_size=HW)
    state = create_seg_state(model, variables, learning_rate=3e-3)
    step = make_seg_train_step(ignore_index=12, label_hw=HW, base_lr=3e-3)
    losses = []
    for n in range(80):
        state, loss = step(state, *batches[n % 2])
        losses.append(float(loss))
    assert losses[-1] < 0.2, losses[-5:]

    class TrainLoader:
        def __iter__(self):
            for im, lab in batches:
                yield {"image": np.asarray(im), "label": np.asarray(lab)}

    mean_iu, val_loss, cls_iu = seg_validate(
        model, state.variables, TrainLoader(), num_classes=13,
        ignore_index=12, label_hw=HW, pad_to_batch=4)
    assert mean_iu >= 0.8, (mean_iu, cls_iu, losses[-5:])
