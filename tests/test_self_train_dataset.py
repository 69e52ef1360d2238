"""Freiburg self-train dataset mode with synthetic pseudo-label artifacts."""

import os

import numpy as np
from PIL import Image

from thermal_semantic_segmentation_tpu.data.freiburg import Freiburg
from thermal_semantic_segmentation_tpu.data.loader import DataLoader
from thermal_semantic_segmentation_tpu.data.self_train_aug import SelfTrainAugment

from synthetic import make_freiburg_tree


def _write_pseudo_artifacts(root, path_soft, path_lp, seed=0):
    """Fake generate_pseudo_label outputs for every train IR frame."""
    rng = np.random.default_rng(seed)
    os.makedirs(path_soft, exist_ok=True)
    os.makedirs(path_lp, exist_ok=True)
    names = sorted(os.listdir(os.path.join(root, "train", "seq_00_day", "00",
                                           "fl_ir_aligned")))
    for name in names:
        soft = rng.dirichlet(np.ones(13), size=(32, 64)).transpose(2, 0, 1)
        np.save(os.path.join(path_soft, name.replace(".png", ".npy")),
                soft.astype(np.float32))
        hard = rng.integers(0, 13, (32, 64)).astype(np.uint8)
        Image.fromarray(hard).save(os.path.join(path_lp, name))
        conf = rng.uniform(0, 1, (32, 64)).astype(np.float16)
        np.save(os.path.join(path_lp, name.replace(".png", "_conf.npy")), conf)


def test_self_train_mode_items(tmp_path):
    root = make_freiburg_tree(str(tmp_path / "freiburg"), n_train=3, n_test=1)
    path_soft = str(tmp_path / "soft")
    path_lp = str(tmp_path / "hard")
    _write_pseudo_artifacts(root, path_soft, path_lp)

    ds = Freiburg(root, "train", "IR", segmentation_mode=True, self_train=True,
                  augmentations=SelfTrainAugment(1200, (512, 256), 0.5),
                  path_soft=path_soft, path_lp=path_lp, threshold=0.3,
                  ignore_index=12, proto_rectify=True)
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (256, 512, 1)
    assert item["label"].shape == (256, 512)
    assert item["label_hard"].shape == (256, 512)
    assert item["label_soft"].shape == (13, 256, 512)
    assert item["image_full"].shape == (320, 700, 1)
    # thresholded hard labels keep only classes {5, 11} plus ignore
    assert set(np.unique(item["label_hard"])) <= {5, 11, 12}
    wp = item["weak_params"]
    assert wp["resized_hw"].shape == (2,) and wp["crop"].shape == (4,)
    assert wp["crop"][1] - wp["crop"][0] == 256
    assert wp["crop"][3] - wp["crop"][2] == 512

    # batch collation keeps the weak_params as stacked arrays
    loader = DataLoader(ds, 2, shuffle=False, drop_last=True)
    batch = next(iter(loader))
    assert batch["weak_params"]["resized_hw"].shape == (2, 2)
    assert batch["weak_params"]["flip"].shape == (2,)
    assert batch["label_soft"].shape == (2, 13, 256, 512)
