"""Cityscapes source dataset (original + translated variants).

Replicates data/source_dataset.py: the 19-class label ids are merged down to
the 13-class Freiburg taxonomy via ID_TO_TRAIN_ID (:45-49); unmapped ids
become ignore (12). The remap is a 256-entry LUT instead of the reference's
per-key Python loop (base_dataset.py:99-103) — one vectorized gather.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
from PIL import Image

from .list_files import cityscapes_list, parse_list_file

CLASSES = ['road', 'sidewalk', 'building', 'wall', 'fence', 'pole',
           'traffic light', 'traffic sign', 'vegetation', 'terrain', 'sky',
           'person', 'rider', 'car', 'truck', 'bus', 'train', 'motorcycle',
           'bicycle']

# 19-class label ids -> merged 13-class Freiburg taxonomy (source_dataset.py:45-49)
ID_TO_TRAIN_ID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5,
    19: 5, 20: 5, 21: 6, 22: 7, 23: 8, 24: 9, 25: 9,
    26: 10, 27: 10, 28: 10, 31: 10, 32: 11, 33: 11,
}

IGNORE_LABEL = 12


def _build_lut(mapping: dict, ignore: int) -> np.ndarray:
    lut = np.full(256, ignore, dtype=np.int64)
    for k, v in mapping.items():
        lut[k] = v
    return lut

_LUT = _build_lut(ID_TO_TRAIN_ID, IGNORE_LABEL)


def remap_label(label: np.ndarray) -> np.ndarray:
    """Vectorized id->train-id remap; unmapped ids -> ignore (12)."""
    return _LUT[np.asarray(label, dtype=np.int64).clip(0, 255)]


class Cityscapes:
    """Original (or translated) Cityscapes images with merged 13-class labels."""

    def __init__(self, root: str, *, split: str = "train",
                 data_folder: str = "leftImg8bit",
                 label_folder: str = "gtFine_labelIds",
                 transforms: Optional[Callable] = None,
                 train_mode: bool = True):
        assert split in ("train", "val")
        list_path = os.path.join(root, "image_list", f"{data_folder}_{split}.txt")
        if not os.path.exists(list_path):
            cityscapes_list(root, data_folder, split, list_root=root)
        self.data_list = parse_list_file(list_path)
        # label path derived by folder-name substitution (source_dataset.py:73-76, 144-147)
        self.label_list = [p.replace(data_folder, label_folder) for p in self.data_list]
        self.data_folder = data_folder
        self.transforms = transforms
        self.train_mode = train_mode

    def __len__(self) -> int:
        return len(self.data_list)

    def get(self, index: int, rng: np.random.Generator) -> dict:
        image_name = self.data_list[index]
        image = Image.open(image_name)
        if self.data_folder == "leftImg8bit":
            image = image.convert("RGB")
        if not self.train_mode:
            img, _ = self.transforms(rng, image, None)
            translation_name = image_name.replace("leftImg8bit", "translation")
            return {"image": img, "img_path": translation_name}
        label = Image.open(self.label_list[index])
        img, lab = self.transforms(rng, image, label)
        return {"image": img, "label": remap_label(lab)}


def CityscapesTranslation(root: str, data_folder: str = "translation", **kwargs):
    """Translated Cityscapes (reads from the translation folder)."""
    return Cityscapes(root, data_folder=data_folder, **kwargs)


# merged 13-class train-id colors (source_dataset.py:51-55 head of the table)
TRAIN_ID_TO_COLOR = np.array([
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (107, 142, 35), (152, 251, 152),
    (70, 130, 180), (220, 20, 60), (0, 0, 142), (119, 11, 32), (0, 0, 0),
], dtype=np.uint8)


def decode_target(target: np.ndarray) -> np.ndarray:
    """Train-id map -> RGB visualization (base_dataset.py:117-138 capability)."""
    t = np.clip(np.asarray(target, np.int64), 0, len(TRAIN_ID_TO_COLOR) - 1)
    return TRAIN_ID_TO_COLOR[t]
