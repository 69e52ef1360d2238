"""Datasets, transforms, and the prefetching loader."""

from PIL import ImageFile

# The reference sets this at every entry point (main.py:17,
# self_train_main.py:144, generate_pseudo_label.py:100) so a truncated PNG in
# a 10k-image epoch degrades to a partially-zero image instead of an abort.
ImageFile.LOAD_TRUNCATED_IMAGES = True

from .cityscapes import Cityscapes, CityscapesTranslation, remap_label
from .freiburg import Freiburg, FreiburgTest, FreiburgTranslationPairs
from .loader import DataLoader, default_collate, split_indices
from .palette import colorize_prediction, freiburg_palette
from .self_train_aug import SelfTrainAugment
from .simple import DistanceDataset, FlirTrain, Kitti

__all__ = ["Cityscapes", "CityscapesTranslation", "remap_label", "Freiburg",
           "FreiburgTest", "FreiburgTranslationPairs", "DataLoader",
           "default_collate", "split_indices", "colorize_prediction",
           "freiburg_palette", "SelfTrainAugment", "DistanceDataset",
           "FlirTrain", "Kitti"]
