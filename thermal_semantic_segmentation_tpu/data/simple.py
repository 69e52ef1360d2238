"""Unlabeled / paired auxiliary datasets: KITTI, FLIR, translation-distance.

Replicates data/kitti_dataset.py, data/target_dataset.py and
data/distance_dataset.py.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
from PIL import Image, ImageOps

from .freiburg import COL_CROP, RAW_SIZE, load_ir_image
from .list_files import flir_list, kitti_list, parse_list_file


class Kitti:
    """Unlabeled KITTI raw frames (data/kitti_dataset.py:26-67)."""

    def __init__(self, root: str, transforms: Callable, *, grayscale: bool = False,
                 translation_mode: bool = False, translation_name: str = "translation"):
        list_file = os.path.join(root, "image_list", "kitti_data.txt")
        if not os.path.exists(list_file):
            kitti_list(root)
        self.data_list = parse_list_file(list_file)
        self.transforms = transforms
        self.grayscale = grayscale
        self.translation_mode = translation_mode
        self.translation_name = translation_name

    def __len__(self) -> int:
        return len(self.data_list)

    def get(self, index: int, rng: np.random.Generator):
        image_name = self.data_list[index]
        image = Image.open(image_name).convert("RGB")
        if self.grayscale:
            image = ImageOps.grayscale(image)
        img, _ = self.transforms(rng, image, None)
        out = {"image": img}
        if self.translation_mode:
            out["img_path"] = self.translation_name + image_name
        return out


class FlirTrain:
    """Unlabeled FLIR ADAS thermal frames (data/target_dataset.py:7-39)."""

    def __init__(self, root: str, transforms: Callable):
        list_file = os.path.join(root, "image_list", "train.txt")
        if not os.path.exists(list_file):
            flir_list(root, "train")
        self.data_list = parse_list_file(list_file)
        self.transforms = transforms

    def __len__(self) -> int:
        return len(self.data_list)

    def get(self, index: int, rng: np.random.Generator):
        image = Image.open(self.data_list[index])
        img, _ = self.transforms(rng, image, None)
        return {"image": img}


class DistanceDataset:
    """(original, translated) pairs for translation-quality eval
    (data/distance_dataset.py:9-49)."""

    def __init__(self, root: str, translate_name: str, *, split: str = "train",
                 domain: str = "IR", with_label: bool = False):
        list_file = os.path.join(root, "image_list", f"{split}_{domain}_data.txt")
        if not os.path.exists(list_file):
            # standalone distance_evaluate runs (no upstream CLI has written
            # the lists yet): generate them with the shared grammar
            from .list_files import freiburg_lists
            freiburg_lists(root, split, domain)
        self.data_list = parse_list_file(list_file)
        self.label_list = None
        if with_label:
            # segmentation labels aligned with the originals (same list-file
            # grammar as Freiburg); enables per-class translation fidelity —
            # a global L1 cannot see a rare class translated into another
            # class's intensity range (the reference's distance_evaluate.py
            # has no per-class view; this failure mode was measured on the
            # round-3 synthetic pipeline gate)
            label_file = os.path.join(root, "image_list",
                                      f"{split}_{domain}_label.txt")
            if not os.path.exists(label_file):
                from .list_files import freiburg_lists
                freiburg_lists(root, split, domain)
            self.label_list = parse_list_file(label_file)
            assert len(self.label_list) == len(self.data_list), \
                (len(self.label_list), len(self.data_list))
        self.root = root
        self.translate_name = translate_name
        self.split = split
        self.domain = domain

    def __len__(self) -> int:
        return len(self.data_list)

    def get(self, index: int, rng: np.random.Generator):
        ori_name = self.data_list[index]
        # substitute only root-relative (the raw replace would also rewrite
        # a dataset root containing 'train'; see Freiburg._swap_split)
        rel = os.path.relpath(ori_name, self.root)
        trans_name = os.path.join(self.root, rel.replace(
            self.split, self.translate_name).replace("ir_aligned", "rgb"))
        if self.domain == "IR":
            ori = np.asarray(load_ir_image(ori_name), dtype=np.float32)[..., None]
        elif self.domain == "RGB":
            arr = np.array(Image.open(ori_name).convert("RGB").resize(RAW_SIZE, Image.BICUBIC),
                           dtype=np.float32)[:, COL_CROP[0]:COL_CROP[1]]
            ori = np.uint8(arr).astype(np.float32) / 255.0
        else:
            raise ValueError("Not a valid domain.")
        raw = np.asarray(Image.open(trans_name))
        trans = raw.astype(np.float32)
        # check the SOURCE dtype: a near-black uint8 frame (max <= 1) would
        # slip past a value-range heuristic and be scored unscaled
        if raw.dtype == np.uint8 or trans.max() > 1.5:
            trans = trans / 255.0
        if trans.ndim == 2:
            trans = trans[..., None]
        out = {"original": ori, "translated": trans.astype(np.float32)}
        if self.label_list is not None:
            from .freiburg import load_label
            # same RAW_SIZE resize + column crop as the original frame, so
            # the mask aligns pixelwise with original/translated
            out["label"] = np.asarray(load_label(self.label_list[index]),
                                      dtype=np.int32)
        return out
