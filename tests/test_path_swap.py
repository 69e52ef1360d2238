"""Path-substitution hardening: swaps must be root-relative.

The reference derives sibling paths (labels, translated frames) with raw
``str.replace`` on the FULL path (utils/misc.py:236-279,
data/freiburg_dataset.py:95,144-147, data/distance_dataset.py:30-31).
That corrupts any dataset whose *root directory* happens to contain the
pattern — e.g. a root under ``.../retrain_v2/`` breaks the
'train'->translation swap, a root under ``.../rgb_exports/`` breaks the
'rgb'->'rgb_labels' label derivation. Our swaps operate on the
root-relative part only; these tests pin that down with hostile roots.
"""

import os

import numpy as np
from PIL import Image

from thermal_semantic_segmentation_tpu.data import transforms as T
from thermal_semantic_segmentation_tpu.data.freiburg import Freiburg
from thermal_semantic_segmentation_tpu.data.list_files import (freiburg_lists,
                                                               parse_list_file)
from thermal_semantic_segmentation_tpu.data.simple import DistanceDataset

from synthetic import make_freiburg_tree


def val_transform():
    return T.Compose([T.Resize((512, 256)), T.ToArray()])


def _lists_exist(root, split, domain):
    data_file, label_file = freiburg_lists(root, split, domain)
    data = parse_list_file(data_file)
    labels = parse_list_file(label_file)
    assert data and len(data) == len(labels)
    missing = [p for p in labels if not os.path.exists(p)]
    assert not missing, f"label paths corrupted by root substring: {missing}"


def test_rgb_label_swap_survives_rgb_in_root(tmp_path):
    # raw replace would turn .../rgb_exports/... into .../rgb_labels_exports/...
    root = make_freiburg_tree(str(tmp_path / "rgb_exports" / "freiburg"))
    _lists_exist(root, "train", "RGB")


def test_ir_label_swap_survives_ir_aligned_in_root(tmp_path):
    root = make_freiburg_tree(str(tmp_path / "ir_aligned_sets" / "freiburg"))
    _lists_exist(root, "train", "IR")


def test_test_split_swap_survives_images_dir_in_root(tmp_path):
    root = make_freiburg_tree(str(tmp_path / "ImagesIR_v1" / "freiburg"))
    _lists_exist(root, "test", "IR")


def test_translation_swap_survives_train_in_root(tmp_path):
    # 'retrain_v2' contains the split name 'train': the reference's
    # image_name.replace(split, translation_name) would rewrite the root
    root = make_freiburg_tree(str(tmp_path / "retrain_v2" / "freiburg"),
                              translation_name="trans")
    ds = Freiburg(root, "train", "RGB", transforms=val_transform(),
                  segmentation_mode=True, translation_name="trans")
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (256, 512, 1)
    # the split segment itself IS swapped
    swapped = ds._swap_split(os.path.join(root, "train", "x", "train.png"))
    assert swapped == os.path.join(root, "trans", "x", "train.png")


def test_distance_dataset_swap_survives_train_in_root(tmp_path):
    root = str(tmp_path / "train_rigs" / "freiburg")
    ir = os.path.join(root, "train", "seq_00_day", "00", "fl_ir_aligned",
                      "0000.png")
    os.makedirs(os.path.dirname(ir))
    rng = np.random.default_rng(0)
    arr = rng.integers(21800, 25000, size=(40, 120)).astype(np.uint16)
    Image.fromarray(arr).save(ir)
    trans = os.path.join(root, "t130", "seq_00_day", "00", "fl_rgb",
                         "0000.png")
    os.makedirs(os.path.dirname(trans))
    Image.fromarray(rng.integers(0, 255, size=(40, 120)).astype(np.uint8),
                    mode="L").save(trans)
    lst = os.path.join(root, "image_list", "train_IR_data.txt")
    os.makedirs(os.path.dirname(lst))
    with open(lst, "w") as f:
        f.write(ir + "\n")
    ds = DistanceDataset(root, "t130", split="train", domain="IR")
    item = ds.get(0, np.random.default_rng(1))
    assert item["translated"].shape == (40, 120, 1)
    assert 0.0 <= item["translated"].max() <= 1.0
