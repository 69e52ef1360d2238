"""The self-train gate's domain-gap tree: grammar + constructed-shift checks.

make_selftrain_freiburg_tree fabricates two co-registered domains over the
same banded class maps (tests/synthetic.py): clean "translated" source frames
(read through the reference's split->translation_name path substitution,
data/freiburg_dataset.py:95) and IR target frames whose class intensities are
shifted by a fraction of a class slot plus sensor noise. These tests pin the
construction the on-chip gate (bench_all.py selftrain_gate) relies on:
source intensity must encode the label exactly, and the target shift must be
the designed covariate shift — not an accidental relabeling.
"""

import numpy as np
import pytest

from tests.synthetic import make_selftrain_freiburg_tree
from thermal_semantic_segmentation_tpu.data import transforms as T
from thermal_semantic_segmentation_tpu.data.freiburg import Freiburg, FreiburgTest

HW = (320, 960)          # loader RAW_SIZE: resizes are identities
N_CLASSES = 13
SHIFT = 0.35
NOISE = 0.25


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stgate") / "freiburg")
    make_selftrain_freiburg_tree(root, n_train=4, n_test=2, seed=0, hw=HW,
                                 target_shift_slots=SHIFT,
                                 target_noise_slots=NOISE)
    return root


def test_source_translated_intensity_encodes_label(tree):
    tf = T.Compose([T.ToArray()])
    ds = Freiburg(tree, "train", "RGB", segmentation_mode=True,
                  translation_name="synthetic_translation", transforms=tf)
    rng = np.random.default_rng(0)
    item = ds.get(0, rng)
    img = item["image"][..., 0]                      # (H, W) in [0, 1]
    label = item["label"]
    # intensity slot -> class, exact on non-ignore pixels (tiny u8 noise)
    decoded = np.clip(np.floor(img * N_CLASSES), 0, N_CLASSES - 1)
    keep = label != 12
    assert keep.mean() > 0.8
    assert (decoded[keep] == label[keep]).mean() > 0.995


def test_target_ir_band_centers_are_shifted(tree):
    tf = T.Compose([T.ToArray()])
    ds = Freiburg(tree, "train", "IR", transforms=tf, with_label=True)
    rng = np.random.default_rng(0)
    gaps = []
    for i in range(4):
        item = ds.get(i, rng)
        img, label = item["image"][..., 0], item["label"]
        for cls in np.unique(label):
            if cls == 12:
                continue
            mean = img[label == cls].mean() * N_CLASSES - 0.5 - cls
            gaps.append(mean)
    gaps = np.asarray(gaps)
    # every band center sits ~SHIFT slots above its source-domain slot, well
    # clear of both 0 (no gap) and 0.5 (relabeled to the next class)
    assert np.all(gaps > SHIFT - 0.15) and np.all(gaps < 0.5), gaps


def test_target_noise_crosses_boundaries_but_majority_correct(tree):
    tf = T.Compose([T.ToArray()])
    ds = FreiburgTest(tree, "test", "IR", transforms=tf, with_label=True)
    rng = np.random.default_rng(0)
    item = ds.get(0, rng)
    img, label = item["image"][..., 0], item["label"]
    decoded = np.clip(np.floor(img * N_CLASSES), 0, N_CLASSES - 1)
    keep = label != 12
    acc = (decoded[keep] == label[keep]).mean()
    # the constructed gap: pointwise intensity decoding must be degraded
    # (tail of the shifted+noisy distribution crosses the slot boundary)
    # yet majority-correct, or pseudo-labels could never bootstrap
    assert 0.55 < acc < 0.92, acc


def test_test_split_grammar_and_class_coverage(tree):
    covered = set()
    for i in range(2):
        lab = np.load(f"{tree}/test/day/SegmentationClass/{i:04d}_rgb.npy")
        covered.update(np.unique(lab).tolist())
    assert len(covered - {12}) >= 6      # round-robin bands cover classes
