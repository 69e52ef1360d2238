"""Fabricate tiny dataset trees matching the reference directory grammar
(utils/misc.py:186-301), for integration tests of the full data+train stack."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _save_u16(path, rng, shape=(40, 120)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # IR range straddling the radiometric window [21800, 25000]
    arr = rng.integers(21000, 26000, size=shape).astype(np.uint16)
    Image.fromarray(arr).save(path)


def _save_rgb(path, rng, shape=(40, 120)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = rng.integers(0, 255, size=(*shape, 3)).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _save_label(path, rng, shape=(40, 120), num_classes=13):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = rng.integers(0, num_classes, size=shape).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path)


def make_freiburg_tree(root: str, n_train: int = 4, n_test: int = 2,
                       translation_name: str | None = None, seed: int = 0,
                       hw=(40, 120)) -> str:
    """Freiburg layout:
      train/seq_00_day/00/fl_ir_aligned/NNNN.png   (uint16 IR)
      train/seq_00_day/00/fl_rgb/NNNN.png          (RGB)
      train/seq_00_day/00/fl_rgb_labels/NNNN.png   (labels; shared by IR+RGB
         via the 'ir_aligned'->'rgb_labels' / 'rgb'->'rgb_labels' substitutions)
      test/day/ImagesIR/NNNN_ir.png + test/day/SegmentationClass/NNNN_rgb.npy

    ``hw=(320, 960)`` gives frames at the real aligned-IR raw size (the
    perf benches use it; the tiny default keeps unit tests fast).
    """
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "train", "seq_00_day", "00")
    for i in range(n_train):
        _save_u16(os.path.join(base, "fl_ir_aligned", f"{i:04d}.png"), rng, hw)
        _save_rgb(os.path.join(base, "fl_rgb", f"{i:04d}.png"), rng, hw)
        _save_label(os.path.join(base, "fl_rgb_labels", f"{i:04d}.png"), rng,
                    hw)
        if translation_name:
            # translated source frames as the s2t translator writes them:
            # single-channel thermal-like uint8 PNGs (cli/translator.py)
            tbase = os.path.join(root, translation_name, "seq_00_day", "00")
            _save_label(os.path.join(tbase, "fl_rgb", f"{i:04d}.png"), rng,
                        hw, num_classes=256)
    for i in range(n_test):
        _save_u16(os.path.join(root, "test", "day", "ImagesIR",
                               f"{i:04d}_ir.png"), rng, hw)
        lbl_path = os.path.join(root, "test", "day", "SegmentationClass", f"{i:04d}_rgb.npy")
        os.makedirs(os.path.dirname(lbl_path), exist_ok=True)
        np.save(lbl_path, rng.integers(0, 13, size=hw).astype(np.uint8))
    return root


def make_cityscapes_tree(root: str, n: int = 3, data_folder: str = "leftImg8bit",
                         seed: int = 1) -> str:
    rng = np.random.default_rng(seed)
    for i in range(n):
        img = os.path.join(root, data_folder, "train", "cityA",
                           f"cityA_{i:06d}_{data_folder}.png")
        _save_rgb(img, rng)
        lbl = os.path.join(root, "gtFine_labelIds", "train", "cityA",
                           f"cityA_{i:06d}_gtFine_labelIds.png")
        os.makedirs(os.path.dirname(lbl), exist_ok=True)
        arr = rng.integers(0, 34, size=(40, 120)).astype(np.uint8)
        Image.fromarray(arr, mode="L").save(lbl)
    return root


def _banded_class_map(rng, shape, n_classes=13, n_bands=6,
                      boundary_ignore=10, ignore_index=12, classes=None,
                      alphas=None):
    """Piecewise-constant vertical class bands (distinct classes, random
    order/widths), with an ``ignore_index`` strip carved over each interior
    boundary of the LABEL.

    Labels are derivable from pixel intensity by construction (see
    _ir_from_classes), EXCEPT on boundary ramps: the protocol's BICUBIC
    resizes interpolate between band intensities, and the interpolants land
    in OTHER classes' intensity slots — supervising those pixels teaches a
    contradictory map (measured: mid-window class 6 collapses to IoU 0.0
    because interpolated ramp values are the most common there). The ignore
    strip removes that noise from both CE and the confusion matrix, making
    interiors cleanly learnable (~1.0 IoU). Classes absent from the test set
    drop out of nanmean(iu[:11]) rather than scoring 0."""
    h, w = shape
    if classes is not None:
        order = np.asarray(classes)
    else:
        order = rng.choice(n_classes, size=min(n_bands, n_classes),
                           replace=False)
    if alphas is None:
        alphas = np.full(len(order), 5.0)
    widths = rng.dirichlet(alphas) * w
    edges = np.concatenate([[0], np.round(np.cumsum(widths))]).astype(int)
    edges[-1] = w
    bands = np.zeros((h, w), np.uint8)
    for k, cls in enumerate(order):
        bands[:, edges[k]:edges[k + 1]] = cls
    label = bands.copy()
    half = boundary_ignore // 2
    for e in edges[1:-1]:
        label[:, max(e - half, 0):e + half] = ignore_index
    return label, bands


def _ir_from_classes(rng, label, n_classes=13, noise=30.0):
    """Class k -> raw IR value centered in slot k of the radiometric window
    [21800, 25000] (data/freiburg.py IR_MIN/IR_MAX), +- small noise. The
    windowed, normalized pixel value is then (k + 0.5)/n_classes: intensity
    uniquely identifies the class."""
    span = (25000.0 - 21800.0) / n_classes
    raw = 21800.0 + (label.astype(np.float32) + 0.5) * span
    raw = raw + rng.normal(0, noise, size=label.shape).astype(np.float32)
    return np.clip(raw, 21800, 25000).astype(np.uint16)


def make_learnable_freiburg_tree(root: str, n_train: int = 24, n_test: int = 8,
                                 seed: int = 0, hw=(320, 960),
                                 n_classes: int = 13, n_bands: int = 6) -> str:
    """Freiburg-layout tree whose labels are derivable from image content —
    the synthetic convergence gate's dataset (a segmenter trained on it must
    reach ~1.0 mIoU through the full real pipeline, or the framework is
    broken). Default ``hw`` equals the loader's RAW_SIZE so the BICUBIC
    resize in load_ir_image is an identity and class boundaries stay sharp.
    """
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "train", "seq_00_day", "00")
    for i in range(n_train):
        label, bands = _banded_class_map(rng, hw, n_classes, n_bands)
        ir = _ir_from_classes(rng, bands, n_classes)
        p = os.path.join(base, "fl_ir_aligned", f"{i:04d}.png")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(ir).save(p)
        _save_rgb(os.path.join(base, "fl_rgb", f"{i:04d}.png"), rng, hw)
        lp = os.path.join(base, "fl_rgb_labels", f"{i:04d}.png")
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        Image.fromarray(label, mode="L").save(lp)
    for i in range(n_test):
        # deterministic round-robin class coverage: a class ABSENT from the
        # test labels but predicted anywhere scores IoU 0.0 (not nan — the
        # reference _fast_hist counts its predicted column), silently
        # dragging nanmean(iu[:11]) down. Guarantee every class appears.
        cls = [(n_bands * i + j) % n_classes for j in range(n_bands)]
        label, bands = _banded_class_map(rng, hw, n_classes, n_bands,
                                         classes=rng.permutation(cls))
        ir = _ir_from_classes(rng, bands, n_classes)
        p = os.path.join(root, "test", "day", "ImagesIR", f"{i:04d}_ir.png")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(ir).save(p)
        lp = os.path.join(root, "test", "day", "SegmentationClass",
                          f"{i:04d}_rgb.npy")
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        np.save(lp, label)
    return root


def make_selftrain_freiburg_tree(root: str, n_train: int = 256, n_test: int = 8,
                                 seed: int = 0, hw=(320, 960),
                                 n_classes: int = 13, n_bands: int = 3,
                                 translation_name: str = "synthetic_translation",
                                 source_noise_u8: float = 2.0,
                                 target_shift_slots: float = 0.35,
                                 target_noise_slots: float = 0.25) -> str:
    """Freiburg tree with a CONSTRUCTED DOMAIN GAP for the self-train gate.

    Two co-registered domains over the same banded class maps
    (_banded_class_map), mirroring the real pipeline where translated source
    frames are pixel-aligned with their labels:

    - SOURCE = "translated" frames under ``<translation_name>/…/fl_rgb/``
      (read by ``Freiburg(segmentation_mode=True)`` via the reference's
      split->translation_name path substitution, data/freiburg_dataset.py:95):
      clean uint8 'L' images, class k at intensity (k+0.5)/13*255, tiny noise.
      A segmenter trains to ~1.0 mIoU on these.
    - TARGET = IR frames under ``train/…/fl_ir_aligned`` and the test split:
      the SAME intensity->class rule but with every band's raw value shifted
      by ``target_shift_slots`` of a class slot and blurred with
      ``target_noise_slots`` of per-pixel sensor noise. The shift moves each
      class cluster toward its upper decision boundary and the noise pushes a
      tail of pixels across it, so a source-trained model degrades on target
      in the classic covariate-shift way (majority of pixels still correct ->
      pseudo-labels are bootstrappable; the self-training loop must move the
      boundaries to the target clusters and recover the margin).
    """
    rng = np.random.default_rng(seed)
    slot = (25000.0 - 21800.0) / n_classes

    def target_ir(bands):
        raw = 21800.0 + (bands.astype(np.float32) + 0.5 + target_shift_slots) * slot
        raw = raw + rng.normal(0, target_noise_slots * slot,
                               size=bands.shape).astype(np.float32)
        return np.clip(raw, 21800, 25000).astype(np.uint16)

    def source_u8(bands):
        val = (bands.astype(np.float32) + 0.5) * (255.0 / n_classes)
        val = val + rng.normal(0, source_noise_u8, size=bands.shape)
        return np.clip(np.round(val), 0, 255).astype(np.uint8)

    base = os.path.join(root, "train", "seq_00_day", "00")
    tbase = os.path.join(root, translation_name, "seq_00_day", "00")
    for i in range(n_train):
        label, bands = _banded_class_map(rng, hw, n_classes, n_bands)
        for sub, arr, mode in (
                ("fl_ir_aligned", target_ir(bands), None),
                ("fl_rgb_labels", label, "L")):
            p = os.path.join(base, sub, f"{i:04d}.png")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            Image.fromarray(arr, mode=mode).save(p)
        _save_rgb(os.path.join(base, "fl_rgb", f"{i:04d}.png"), rng, hw)
        # translated frames are read verbatim (no resize/column-crop,
        # data/freiburg.py _load_image translation branch) — write them in
        # the post-crop geometry the labels land in (cols 150:850 of the
        # 960-wide raw, load_label), as the real translator does
        c0, c1 = round(150 * hw[1] / 960), round(850 * hw[1] / 960)
        p = os.path.join(tbase, "fl_rgb", f"{i:04d}.png")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(source_u8(bands[:, c0:c1]), mode="L").save(p)
    for i in range(n_test):
        cls = [(n_bands * i + j) % n_classes for j in range(n_bands)]
        label, bands = _banded_class_map(rng, hw, n_classes, n_bands,
                                         classes=rng.permutation(cls))
        p = os.path.join(root, "test", "day", "ImagesIR", f"{i:04d}_ir.png")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(target_ir(bands)).save(p)
        lp = os.path.join(root, "test", "day", "SegmentationClass",
                          f"{i:04d}_rgb.npy")
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        np.save(lp, label)
    return root


# distinct saturated hues, one per band index (GAN gate tree)
_GAN_PALETTE = np.array([[200, 40, 40], [40, 200, 40], [40, 80, 220],
                         [220, 200, 40], [160, 40, 200]], np.float32)


def _gan_band_frame(rng, hw, n_bands, alphas):
    """(label, bands) for one GAN-gate frame: the dirichlet band layout is
    drawn over the COLUMN-CROP-VISIBLE window and the outermost bands are
    edge-extended into the cropped margins.

    Every Freiburg data path resizes to (960, 320) then crops columns
    150:850 (data/freiburg.py COL_CROP, reference freiburg_dataset.py:72-92),
    so a fixed-order band layout drawn over the FULL width leaves class 0
    (expected width ~10% of 960 = 96 px < the 150-col left margin) entirely
    outside the visible window and class 1 mostly cropped. Measured through
    the full pipeline gate: class 0 IoU nan on the test split, class 1
    starved to IoU 0.0, capping nanmean(iu[:11]) at ~0.68. Drawing the
    bands over the visible 700 columns restores the intended width law for
    every class after the crop; the margin extensions are constant fills
    that the crop removes identically from image, IR, and label."""
    h, w = hw
    c0 = int(round(w * 150 / 960))
    c1 = int(round(w * 850 / 960))
    label_v, bands_v = _banded_class_map(rng, (h, c1 - c0),
                                         n_classes=n_bands, n_bands=n_bands,
                                         classes=np.arange(n_bands),
                                         alphas=alphas)

    def extend(a):
        return np.hstack([np.repeat(a[:, :1], c0, axis=1), a,
                          np.repeat(a[:, -1:], w - c1, axis=1)])

    return extend(label_v), extend(bands_v)


def make_gan_freiburg_tree(root: str, n_train: int = 512, n_test: int = 0,
                           seed: int = 0, hw=(320, 960), n_bands: int = 5,
                           noise_slots: float = 0.15,
                           rgb_noise: float = 3.0) -> str:
    """Freiburg tree with pixel-ALIGNED rgb/ir pairs whose mapping an
    unpaired CycleGAN must recover — the GAN translation-quality gate's
    dataset.

    Every frame is vertical bands in the FIXED class order 0..n_bands-1
    (only the edge positions vary): rgb renders band k as palette color k,
    ir renders it as intensity slot k of the radiometric window, and band
    k's expected WIDTH grows with k (dirichlet alphas 4+2k, a 3x spread;
    the narrowest class still averages ~10% of the crop-visible window — a
    first 5x-spread law pinned the mapping, L1 ratio 0.334, but starved the
    two narrowest classes of supervision and they scored IoU 0/nan through
    the downstream segmentation pipeline). Bands are laid out over the
    column-crop-visible window (see _gan_band_frame) so the reference's
    150:850 crop cannot starve the narrow classes a second way.

    The width law is what breaks the intensity-permutation symmetry that
    unpaired losses cannot otherwise see. Monotone band ORDER alone is NOT
    enough: the training transform's RandomHorizontalFlip makes increasing and
    decreasing orders equally 'real', and a first gate run converged to the
    exactly INVERTED map (trained L1 0.359 vs 0.186 for constant gray —
    bands perfect, intensities mirrored). Width-vs-brightness correlation
    is flip-invariant: real target patches with two visible edges (narrow
    bands) are predominantly dark, so a permuted generator mapping wide
    source bands to dark slots is locally detectable by the PatchGAN, and
    the cycle loss pins edges to the source's — making the pixel-aligned
    color->intensity map the only optimum. distance_evaluate's L1 against
    the real aligned IR (reference distance_evaluate.py protocol) then
    measures translation correctness directly."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "train", "seq_00_day", "00")
    span = (25000.0 - 21800.0) / n_bands
    for i in range(n_train):
        label, bands = _gan_band_frame(rng, hw, n_bands,
                                       4.0 + 2.0 * np.arange(n_bands))
        raw = (21800.0 + (bands.astype(np.float32) + 0.5) * span
               + rng.normal(0, noise_slots * span, hw).astype(np.float32))
        ir = np.clip(raw, 21800, 25000).astype(np.uint16)
        rgb = (_GAN_PALETTE[bands]
               + rng.normal(0, rgb_noise, (*hw, 3)).astype(np.float32))
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
        for sub, arr, mode in (("fl_ir_aligned", ir, None),
                               ("fl_rgb", rgb, None),
                               ("fl_rgb_labels", label, "L")):
            p = os.path.join(base, sub, f"{i:04d}.png")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            Image.fromarray(arr, mode=mode).save(p)
    # optional IR test split (for the full-recipe integration gate): same
    # construction, labeled with the band classes. All n_bands classes
    # appear in every frame, so nanmean(iu[:11]) scores exactly those and
    # the never-labeled classes drop out (unless the model strays).
    rng_t = np.random.default_rng(seed + 1)
    for i in range(n_test):
        label, bands = _gan_band_frame(rng_t, hw, n_bands,
                                       4.0 + 2.0 * np.arange(n_bands))
        raw = (21800.0 + (bands.astype(np.float32) + 0.5) * span
               + rng_t.normal(0, noise_slots * span, hw).astype(np.float32))
        ir = np.clip(raw, 21800, 25000).astype(np.uint16)
        p = os.path.join(root, "test", "day", "ImagesIR", f"{i:04d}_ir.png")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(ir).save(p)
        lp = os.path.join(root, "test", "day", "SegmentationClass",
                          f"{i:04d}_rgb.npy")
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        np.save(lp, label)
    return root


def make_kitti_tree(root: str, n: int = 3, seed: int = 2) -> str:
    rng = np.random.default_rng(seed)
    for i in range(n):
        _save_rgb(os.path.join(root, "2011_09_26", "2011_09_26_drive",
                               "image_02", "data", f"{i:010d}.png"), rng)
    return root
