"""Freiburg Thermal dataset family.

Behavioral spec from the reference (data/freiburg_dataset.py):

- IR radiometric normalization (:72-82): open 16-bit PNG, resize to (960, 320)
  BICUBIC, crop columns 150:850 (-> 700x320), clamp to [21800, 25000], scale
  to [0, 1].
- RGB path (:83-92): resize + column crop on uint8 RGB (optional grayscale).
- translation mode (segmentation_mode=True): image path swaps the split
  segment for the translation folder name (:95).
- self-train mode (:107-134): loads saved soft pseudo labels (.npy), hard
  pseudo PNG + fp16 confidence .npy; confidence-thresholds the hard labels and
  keeps only the configured class ids (default (5, 11), :119-125 quirk);
  applies the param-recording augmentations and additionally returns the
  un-augmented full image.
- FreiburgTest (:154-208): labels come from .npy files, same normalization.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Optional, Sequence

import numpy as np
from PIL import Image

from .list_files import freiburg_lists, parse_list_file

IR_MIN, IR_MAX = 21800.0, 25000.0
RAW_SIZE = (960, 320)          # PIL (w, h)
COL_CROP = (150, 850)


def load_ir_image(path: str) -> Image.Image:
    """16-bit IR PNG -> float [0,1] PIL 'F' image, windowed + column-cropped.

    Decoded frames go through the optional data.cache decode cache (decode is
    ~half the per-sample host cost; epoch 2+ skips it entirely when enabled)."""
    def decode():
        image = np.array(Image.open(path).resize(RAW_SIZE, Image.BICUBIC),
                         dtype=np.float32)
        image = image[:, COL_CROP[0]:COL_CROP[1]]
        image = np.clip(image, IR_MIN, IR_MAX)
        return (image - IR_MIN) / (IR_MAX - IR_MIN)

    if not isinstance(path, str):          # file-like (e.g. cli/serve.py):
        return Image.fromarray(decode())   # no stable cache key — skip cache
    from .cache import decode_cache
    return Image.fromarray(decode_cache().get_or_decode(("ir", path), decode))


def load_rgb_image(path: str, grayscale: bool = False) -> Image.Image:
    def decode():
        img = Image.open(path).convert("RGB")
        if grayscale:
            from PIL import ImageOps
            img = ImageOps.grayscale(img)
        arr = np.array(img.resize(RAW_SIZE, Image.BICUBIC), dtype=np.float32)
        return np.uint8(arr[:, COL_CROP[0]:COL_CROP[1]])

    from .cache import decode_cache
    return Image.fromarray(
        decode_cache().get_or_decode(("rgb", path, grayscale), decode))


def load_label(path: str) -> Image.Image:
    def decode():
        label = np.array(Image.open(path).resize(RAW_SIZE, Image.NEAREST),
                         dtype=np.uint8)
        return label[:, COL_CROP[0]:COL_CROP[1]]

    from .cache import decode_cache
    return Image.fromarray(
        decode_cache().get_or_decode(("label", path), decode), mode="L")


class Freiburg:
    """Train-split Freiburg in its four modes (plain / translation / self-train)."""

    def __init__(self, root: str, split: str, domain: str, *,
                 transforms: Optional[Callable] = None, with_label: bool = True,
                 grayscale: bool = False, segmentation_mode: bool = False,
                 translation_mode: bool = False,
                 translation_name: str = "translation", self_train: bool = False,
                 augmentations: Optional[Callable] = None,
                 path_soft: Optional[str] = None, path_lp: Optional[str] = None,
                 threshold: float = 0.0, ignore_index: int = 12,
                 proto_rectify: bool = True,
                 hard_keep_classes: Sequence[int] = (5, 11),
                 native_decode: bool = False):
        assert split in ("train", "test")
        data_file = os.path.join(root, "image_list", f"{split}_{domain}_data.txt")
        label_file = os.path.join(root, "image_list", f"{split}_{domain}_label.txt")
        if not (os.path.exists(data_file) and os.path.exists(label_file)):
            freiburg_lists(root, split, domain)
        self.data_list = parse_list_file(data_file)
        self.label_list = parse_list_file(label_file)
        self.root = root
        self.split = split
        self.domain = domain
        self.transforms = transforms
        self.with_label = with_label
        self.grayscale = grayscale
        self.segmentation_mode = segmentation_mode
        self.translation_mode = translation_mode
        self.translation_name = translation_name
        self.self_train = self_train
        self.augmentations = augmentations
        self.path_soft = path_soft
        self.path_lp = path_lp
        self.threshold = threshold
        self.ignore_index = ignore_index
        self.proto_rectify = proto_rectify
        self.hard_keep_classes = tuple(hard_keep_classes)
        self.native_decode = native_decode

    def __len__(self) -> int:
        return len(self.data_list)

    def _swap_split(self, path: str) -> str:
        """Swap the split PATH SEGMENT for the translation folder name.

        The reference does a raw str.replace (freiburg_dataset.py:95,
        144-147) which also rewrites any other 'train' substring in the
        path — a dataset root under e.g. .../self_train_runs/... breaks.
        Only the first root-relative segment equal to the split is swapped.
        """
        rel = os.path.relpath(path, self.root)
        parts = rel.split(os.sep)
        parts[parts.index(str(self.split))] = self.translation_name
        return os.path.join(self.root, *parts)

    def _load_image(self, image_name: str) -> Image.Image:
        if (self.domain == "IR" and not self.segmentation_mode) or self.self_train:
            return load_ir_image(image_name)
        if self.domain == "RGB" and not self.segmentation_mode:
            return load_rgb_image(image_name, self.grayscale)
        if self.segmentation_mode and not self.self_train:
            translated = self._swap_split(image_name)
            from .cache import decode_cache
            arr = decode_cache().get_or_decode(
                ("translated", translated),
                lambda: np.asarray(Image.open(translated)))
            return Image.fromarray(arr)
        raise ValueError("Not a valid domain.")

    def get_batch(self, indices: Sequence[int],
                  rngs: Sequence[np.random.Generator]):
        """Batch fast path: ONE native C++ call decodes the whole batch in a
        thread pool with the GIL released (fused 16-bit decode + resize +
        column crop + IR window, native/tss_io.cpp); the per-sample transform
        chain then runs on the decoded frames. Returns None when this mode has
        no native path (the loader falls back to per-sample ``get``). Note the
        native resize is bilinear, the PIL path BICUBIC — statistically, not
        bitwise, equivalent; the PIL path remains the parity default."""
        from . import native_loader as nl

        plain = not (self.segmentation_mode or self.self_train or self.grayscale)
        if not (self.native_decode and plain and nl.available()):
            return None
        paths = [self.data_list[i] for i in indices]
        if self.domain == "IR":
            arrs = nl.decode_ir_batch(paths)
            images = [Image.fromarray(a[..., 0]) for a in arrs]   # 'F' mode
        else:
            arrs = nl.decode_rgb_batch(paths)
            images = [Image.fromarray(a) for a in arrs]
        return [self.get(i, rng, image=img)
                for i, rng, img in zip(indices, rngs, images)]

    def get(self, index: int, rng: np.random.Generator,
            image: Optional[Image.Image] = None) -> dict:
        image_name = self.data_list[index]
        label_name = self.label_list[index]
        only_img_name = os.path.basename(image_name)
        out = {"img_path": only_img_name}

        if image is None:
            image = self._load_image(image_name)

        if self.translation_mode:
            # offline translator: destination path swaps split -> translation
            # folder (data/freiburg_dataset.py:144-147)
            img, _ = self.transforms(rng, image, None)
            out["image"] = img
            out["img_path"] = self._swap_split(image_name)
            return out

        if not self.with_label:
            img, _ = self.transforms(rng, image, None)
            out["image"] = img
            return out

        label = load_label(label_name)

        if self.self_train:
            label_soft = None
            if self.proto_rectify:
                label_soft = np.load(os.path.join(
                    self.path_soft, only_img_name.replace(".png", ".npy")))
            label_hard = np.array(Image.open(os.path.join(self.path_lp, only_img_name)),
                                  dtype=np.uint8)
            if self.threshold:
                conf = np.load(os.path.join(
                    self.path_lp, only_img_name.replace(".png", "_conf.npy")))
                label_hard = label_hard.copy()
                label_hard[conf <= self.threshold] = self.ignore_index
                keep = np.full(label_hard.shape, self.ignore_index, dtype=np.int64)
                for cid in self.hard_keep_classes:
                    keep[label_hard == cid] = cid
                label_hard = np.array(
                    Image.fromarray(np.uint8(keep)).resize(image.size, Image.NEAREST),
                    dtype=np.uint8)

            image_full = image.copy()
            img, mask, mask_hard, lpsoft, params = self.augmentations(
                rng, image, np.array(label, dtype=np.uint8), label_hard, label_soft)
            out["image"] = _to_chw_float(img)
            out["label"] = mask.astype(np.int64)
            if mask_hard is not None:
                out["label_hard"] = mask_hard.astype(np.int64)
            if lpsoft is not None:
                out["label_soft"] = lpsoft.astype(np.float32)
            out["weak_params"] = params
            out["image_full"] = _to_chw_float(np.asarray(image_full, dtype=np.float32))
            return out

        img, lab = self.transforms(rng, image, label)
        out["image"] = img
        out["label"] = np.asarray(lab, dtype=np.int64)
        return out


def _to_chw_float(arr) -> np.ndarray:
    """HW(C) numpy/PIL -> float32 HWC with an explicit channel dim."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 2:
        a = a[..., None]
    return a


class FreiburgTest:
    """Test split: labels are .npy files (data/freiburg_dataset.py:154-208)."""

    def __init__(self, root: str, split: str, domain: str, *,
                 transforms: Callable, with_label: bool = True,
                 grayscale: bool = False):
        data_file = os.path.join(root, "image_list", f"{split}_{domain}_data.txt")
        label_file = os.path.join(root, "image_list", f"{split}_{domain}_label.txt")
        if not (os.path.exists(data_file) and os.path.exists(label_file)):
            freiburg_lists(root, split, domain)
        self.data_list = parse_list_file(data_file)
        self.label_list = parse_list_file(label_file)
        self.domain = domain
        self.transforms = transforms
        self.with_label = with_label
        self.grayscale = grayscale

    def __len__(self) -> int:
        return len(self.data_list)

    def get(self, index: int, rng: np.random.Generator) -> dict:
        image_name = self.data_list[index]
        if self.domain == "IR":
            image = load_ir_image(image_name)
        elif self.domain == "RGB":
            image = load_rgb_image(image_name, self.grayscale)
        else:
            raise ValueError("Not a valid domain.")

        if not self.with_label:
            img, _ = self.transforms(rng, image, None)
            return {"image": img}

        label = np.load(self.label_list[index])
        label = Image.fromarray(label).resize(RAW_SIZE, Image.NEAREST)
        label = Image.fromarray(np.array(label)[:, COL_CROP[0]:COL_CROP[1]])
        img, lab = self.transforms(rng, image, label)
        return {"image": img, "label": np.asarray(lab, dtype=np.int64)}


class FreiburgTranslationPairs:
    """Translated JPEGs + groundtruth PNG pairs.

    Covers both FreiburgT2S (suffix 'translation.jpg'/'groundtruth.png',
    data/freiburg_dataset.py:211-225) and FreiburgTranslation
    ('_translation.jpg'/'_groundtruth.png', :228-244) via ``strip_underscore``.
    """

    def __init__(self, folder: str, transforms: Callable,
                 root: str = "datasets/freiburg/translations/",
                 strip_underscore: bool = True):
        pattern = os.path.join(root, folder, "*_translation.jpg")
        self.translation_files = sorted(glob.glob(pattern, recursive=True))
        self.transforms = transforms
        self._old = "_translation.jpg" if strip_underscore else "translation.jpg"
        self._new = "_groundtruth.png" if strip_underscore else "groundtruth.png"

    def __len__(self) -> int:
        return len(self.translation_files)

    def get(self, index: int, rng: np.random.Generator) -> dict:
        image_name = self.translation_files[index]
        label_name = image_name.replace(self._old, self._new)
        image = Image.open(image_name)
        label = Image.open(label_name)
        img, lab = self.transforms(rng, image, label)
        return {"image": img, "label": np.asarray(lab, dtype=np.int64)}
