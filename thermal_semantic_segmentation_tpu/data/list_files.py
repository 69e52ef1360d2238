"""Dataset list-file writers replicating the reference directory grammar.

The reference datasets lazily write ``image_list/*.txt`` manifests on first
use (utils/misc.py:186-301). The exact path-derivation rules (label path by
string substitution, glob patterns per dataset) are reproduced so existing
dataset trees work unchanged, with deterministic sorted ordering (os.walk
order is filesystem-dependent in the reference; we sort).
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple


def _walk_files(root: str) -> List[str]:
    out: List[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for filename in sorted(filenames):
            out.append(os.path.join(dirpath, filename))
    return sorted(out)


def freiburg_pairs(root: str, split: str, domain: str,
                   time: str = "day") -> List[Tuple[str, str]]:
    """Enumerate Freiburg (frame, derived-label) path pairs.

    THE single source of the reference grammar (utils/misc.py:236-278) —
    shared by the list-file writer below and cli/doctor.py's tree audit so
    the two can never drift:
      test:  <root>/test/<time>/Images<domain>/**  with labels under
             SegmentationClass, '_<domain>.png' -> '_rgb.npy'
      train: IR  -> <root>/train/seq_*_<time>/*/fl_ir_aligned/*.png,
                    labels via 'ir_aligned' -> 'rgb_labels'
             RGB -> <root>/train/seq_*_<time>/*/fl_rgb/*.png,
                    labels via 'rgb' -> 'rgb_labels'
    Label paths are derived, not checked for existence.
    """
    def swap(path, old, new, suffix=("", "")):
        # substitute only in the root-RELATIVE part: the reference's raw
        # str.replace (misc.py:236-279) corrupts paths whose dataset root
        # itself contains the pattern (e.g. a root under .../rgb_data/...)
        rel = os.path.relpath(path, root).replace(old, new)
        if suffix[0] and rel.endswith(suffix[0]):
            rel = rel[: -len(suffix[0])] + suffix[1]
        return os.path.join(root, rel)

    pairs: List[Tuple[str, str]] = []
    if split == "test":
        im_dir = os.path.join(root, split, time, "Images" + domain)
        for path in _walk_files(im_dir):
            pairs.append((path, swap(
                path, "Images" + domain, "SegmentationClass",
                suffix=("_" + domain.lower() + ".png", "_rgb.npy"))))
    elif split == "train":
        if domain == "IR":
            files = sorted(glob.glob(os.path.join(root, "train", f"seq_*_{time}", "*", "fl_ir_aligned", "*.png")))
            pairs = [(f, swap(f, "ir_aligned", "rgb_labels")) for f in files]
        else:
            files = sorted(glob.glob(os.path.join(root, "train", f"seq_*_{time}", "*", "fl_rgb", "*.png")))
            pairs = [(f, swap(f, "rgb", "rgb_labels")) for f in files]
    else:
        raise ValueError(f"invalid split {split!r}")
    return pairs


def freiburg_lists(root: str, split: str, domain: str, time: str = "day") -> Tuple[str, str]:
    """Write (and return paths of) Freiburg data/label list files, following
    the grammar in :func:`freiburg_pairs`."""
    list_dir = os.path.join(root, "image_list")
    os.makedirs(list_dir, exist_ok=True)
    data_file = os.path.join(list_dir, f"{split}_{domain}_data.txt")
    label_file = os.path.join(list_dir, f"{split}_{domain}_label.txt")

    pairs = freiburg_pairs(root, split, domain, time)
    with open(data_file, "w") as f:
        f.write("".join(p + "\n" for p, _ in pairs))
    with open(label_file, "w") as f:
        f.write("".join(lab + "\n" for _, lab in pairs))
    return data_file, label_file


def cityscapes_list(root: str, data_folder: str, split: str,
                    list_root: str = "datasets/source_dataset") -> str:
    """Write the Cityscapes manifest (utils/misc.py:186-208 grammar).

    ``data_folder`` is 'leftImg8bit', 'translation', or 'gtFine_labelIds';
    only gtFine files ending in 'gtFine_labelIds.png' are listed for labels.
    The manifest lands under ``list_root``/image_list like the reference.
    """
    im_dir = os.path.join(root, data_folder, split)
    list_dir = os.path.join(list_root, "image_list")
    os.makedirs(list_dir, exist_ok=True)
    list_path = os.path.join(list_dir, f"{data_folder}_{split}.txt")
    paths = _walk_files(im_dir)
    if data_folder == "gtFine_labelIds":
        paths = [p for p in paths if p.endswith("gtFine_labelIds.png")]
    with open(list_path, "w") as f:
        f.write("".join(p + "\n" for p in paths))
    return list_path


def kitti_list(root: str) -> str:
    """KITTI raw images: <root>/2011_09_*/2011_09_*/image_02/data/*.png."""
    list_dir = os.path.join(root, "image_list")
    os.makedirs(list_dir, exist_ok=True)
    list_path = os.path.join(list_dir, "kitti_data.txt")
    files = sorted(glob.glob(os.path.join(root, "2011_09_*", "2011_09_*", "image_02", "data", "*.png")))
    with open(list_path, "w") as f:
        f.write("".join(p + "\n" for p in files))
    return list_path


def flir_list(root: str, split: str, data_folder: str = "images") -> str:
    """FLIR ADAS train/test manifests (utils/misc.py:211-233 grammar)."""
    if split == "train":
        im_dir = os.path.join(root, split)
        list_path = os.path.join(root, "image_list", "train.txt")
    elif split == "test":
        im_dir = os.path.join(root, split, data_folder)
        list_path = os.path.join(root, "image_list", f"test_{data_folder}.txt")
    else:
        raise ValueError("path does not exist.")
    os.makedirs(os.path.dirname(list_path), exist_ok=True)
    with open(list_path, "w") as f:
        f.write("".join(p + "\n" for p in _walk_files(im_dir)))
    return list_path


def parse_list_file(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]
