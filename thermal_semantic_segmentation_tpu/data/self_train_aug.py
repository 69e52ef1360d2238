"""Param-recording augmentations for self-training.

Host-side equivalent of utils/self_train_augmentation.py: jointly transforms
(image, gt mask, hard pseudo mask, soft pseudo tensor), recording the random
parameters so the device-side ``full2weak`` inverse (train/self_train.py) can
map teacher features computed on the *full* image into the student's augmented
view.

Recorded params (consumed as fixed-shape arrays, not ragged dicts):
  resized_hw: (2,) int  -- RandomSized output (h, w)
  crop:       (4,) int  -- (y1, y2, x1, x2) of RandomCrop
  flip:       ()  bool  -- RandomHorizontallyFlip applied

The soft pseudo tensor (C, h, w) is resampled with bilinear align_corners
(matching ``F.interpolate(..., align_corners=True)`` in the reference) using
the same interpolation matrices as the device op.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

from ..ops.resize import _interp_matrix_np


def _interp_soft(lpsoft: np.ndarray, h: int, w: int) -> np.ndarray:
    """(C, H, W) float -> (C, h, w), bilinear align_corners=True."""
    mh = _interp_matrix_np(lpsoft.shape[1], h, True)
    mw = _interp_matrix_np(lpsoft.shape[2], w, True)
    out = np.einsum("oh,chw->cow", mh, lpsoft.astype(np.float32))
    return np.einsum("pw,cow->cop", mw, out)


class SelfTrainAugment:
    """RandomSized -> RandomCrop -> RandomHorizontallyFlip with param recording.

    Args mirror the reference CLI (self_train_main.py:147-149):
      resize: base width for RandomSized (default 1200)
      rcrop:  (tw, th) crop size in PIL order (default (512, 256))
      hflip:  flip probability
    """

    def __init__(self, resize: int = 1200, rcrop: Tuple[int, int] = (512, 256),
                 hflip: float = 0.5):
        self.resize = resize
        self.rcrop = tuple(rcrop)
        self.hflip = hflip

    def __call__(self, rng: np.random.Generator, img: Image.Image,
                 mask: np.ndarray, mask_hard: Optional[np.ndarray] = None,
                 lpsoft: Optional[np.ndarray] = None):
        mask_img = Image.fromarray(np.uint8(mask), mode="L")
        hard_img = Image.fromarray(np.uint8(mask_hard), mode="L") if mask_hard is not None else None
        if lpsoft is not None:
            lpsoft = _interp_soft(lpsoft, img.size[1], img.size[0])

        params = {}

        # --- RandomSized (self_train_augmentation.py:130-157) ---
        prop = img.size[0] / img.size[1]
        w = int(rng.uniform(0.5, 1.5) * self.resize)
        h = int(w / prop)
        params["resized_hw"] = np.array([h, w], dtype=np.int32)
        img = img.resize((w, h), Image.BILINEAR)
        mask_img = mask_img.resize((w, h), Image.NEAREST)
        if hard_img is not None:
            hard_img = hard_img.resize((w, h), Image.NEAREST)
        if lpsoft is not None:
            lpsoft = _interp_soft(lpsoft, h, w)

        # --- RandomCrop (self_train_augmentation.py:42-102) ---
        tw, th = self.rcrop
        if w < tw or h < th:
            # undersized: resize straight to the crop size (reference fallback)
            img = img.resize((tw, th), Image.BILINEAR)
            mask_img = mask_img.resize((tw, th), Image.NEAREST)
            if hard_img is not None:
                hard_img = hard_img.resize((tw, th), Image.NEAREST)
            if lpsoft is not None:
                lpsoft = _interp_soft(lpsoft, th, tw)
            params["crop"] = np.array([0, th, 0, tw], dtype=np.int32)
            params["resized_hw"] = np.array([th, tw], dtype=np.int32)
        else:
            x1 = int(rng.integers(0, w - tw + 1))
            y1 = int(rng.integers(0, h - th + 1))
            params["crop"] = np.array([y1, y1 + th, x1, x1 + tw], dtype=np.int32)
            box = (x1, y1, x1 + tw, y1 + th)
            img = img.crop(box)
            mask_img = mask_img.crop(box)
            if hard_img is not None:
                hard_img = hard_img.crop(box)
            if lpsoft is not None:
                lpsoft = lpsoft[:, y1:y1 + th, x1:x1 + tw]

        # --- RandomHorizontallyFlip (self_train_augmentation.py:160-188) ---
        flip = rng.random() < self.hflip
        params["flip"] = np.bool_(flip)
        if flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            mask_img = mask_img.transpose(Image.FLIP_LEFT_RIGHT)
            if hard_img is not None:
                hard_img = hard_img.transpose(Image.FLIP_LEFT_RIGHT)
            if lpsoft is not None:
                lpsoft = lpsoft[:, :, ::-1].copy()

        out_img = np.asarray(img, dtype=np.float32)
        out_mask = np.asarray(mask_img, dtype=np.int64)
        out_hard = np.asarray(hard_img, dtype=np.int64) if hard_img is not None else None
        return out_img, out_mask, out_hard, lpsoft, params
