"""Datasets, transforms, and the prefetching loader."""

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
