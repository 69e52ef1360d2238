"""The GAN gate's aligned rgb/ir tree: crop-visibility + alignment checks.

make_gan_freiburg_tree draws its fixed-order class bands over the
column-crop-visible window (tests/synthetic._gan_band_frame): every Freiburg
data path resizes to (960, 320) then crops columns 150:850 (reference
freiburg_dataset.py:72-92), and a first tree drawn over the full width left
class 0 entirely inside the cropped margin (test-split IoU nan) and class 1
starved (IoU 0.0 through the whole pipeline gate). These tests pin the
property the on-chip pipeline gate (bench_all.py pipeline_gate) relies on:
every class keeps a healthy pixel share AFTER the crop, in both the source
labels and the IR test split, and the aligned IR intensity still encodes the
class exactly.
"""

import numpy as np
import pytest

from tests.synthetic import make_gan_freiburg_tree
from thermal_semantic_segmentation_tpu.data import transforms as T
from thermal_semantic_segmentation_tpu.data.freiburg import (FreiburgTest,
                                                             load_label)

HW = (320, 960)          # loader RAW_SIZE: resizes are identities
N_BANDS = 5
N_TRAIN = 3
N_TEST = 2


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gangate") / "freiburg")
    make_gan_freiburg_tree(root, n_train=N_TRAIN, n_test=N_TEST, seed=0,
                           hw=HW, n_bands=N_BANDS)
    return root


def _class_shares(label, n_classes=N_BANDS, ignore=12):
    valid = label[label != ignore]
    return np.array([(valid == k).mean() for k in range(n_classes)])


def test_every_class_survives_the_crop_in_source_labels(tree):
    import os
    for i in range(N_TRAIN):
        # load_label is the exact pipeline path: NEAREST resize to RAW_SIZE
        # then the 150:850 column crop (reference freiburg_dataset.py:72-92)
        label = np.asarray(load_label(os.path.join(
            tree, "train", "seq_00_day", "00", "fl_rgb_labels",
            f"{i:04d}.png")))
        shares = _class_shares(label)
        # dirichlet alphas 4..12 over the visible window: the narrowest
        # class averages ~10%; anything under 2% means the crop ate it
        assert (shares > 0.02).all(), (i, shares)


def test_every_class_survives_the_crop_in_ir_test_split(tree):
    ds = FreiburgTest(tree, "test", "IR",
                      transforms=T.Compose([T.ToArray()]))
    rng = np.random.default_rng(0)
    for i in range(N_TEST):
        item = ds.get(i, rng)
        shares = _class_shares(np.asarray(item["label"]))
        assert (shares > 0.02).all(), (i, shares)


def test_aligned_ir_intensity_encodes_the_class(tree):
    """Windowed IR value of band k must sit in slot k: (k + 0.5)/n_bands
    up to the construction's 0.15-slot noise — the property that makes the
    pixel-aligned color->intensity map recoverable and lets the pipeline
    gate segment real IR after translation-trained supervision."""
    ds = FreiburgTest(tree, "test", "IR",
                      transforms=T.Compose([T.ToArray()]))
    rng = np.random.default_rng(0)
    item = ds.get(0, rng)
    image = np.asarray(item["image"]).squeeze()
    label = np.asarray(item["label"])
    for k in range(N_BANDS):
        mask = label == k
        assert mask.any()
        med = np.median(image[mask])
        assert abs(med - (k + 0.5) / N_BANDS) < 0.5 / N_BANDS, (k, med)
