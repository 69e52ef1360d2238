"""Data pipeline tests: list-file grammar, IR normalization, transforms, loader."""

import numpy as np
import pytest

from thermal_semantic_segmentation_tpu.data import transforms as T
from thermal_semantic_segmentation_tpu.data.cityscapes import Cityscapes, remap_label
from thermal_semantic_segmentation_tpu.data.freiburg import Freiburg, FreiburgTest
from thermal_semantic_segmentation_tpu.data.loader import DataLoader, split_indices
from thermal_semantic_segmentation_tpu.data.simple import Kitti
from thermal_semantic_segmentation_tpu.data.palette import colorize_prediction

from synthetic import make_cityscapes_tree, make_freiburg_tree, make_kitti_tree


@pytest.fixture(scope="module")
def freiburg_root(tmp_path_factory):
    return make_freiburg_tree(str(tmp_path_factory.mktemp("freiburg")),
                              translation_name="freiburg_rgb2ir_130epochs")


def val_transform():
    return T.Compose([T.Resize((512, 256)), T.ToArray()])


def train_transform():
    return T.Compose([
        T.RandomResizedCrop(size=(256, 512), ratio=(1.5, 8 / 3.), scale=(0.5, 1.0)),
        T.RandomHorizontalFlip(),
        T.ToArray(),
    ])


def test_freiburg_ir_train(freiburg_root):
    ds = Freiburg(freiburg_root, "train", "IR", transforms=val_transform())
    assert len(ds) == 4
    item = ds.get(0, np.random.default_rng(0))
    img, lab = item["image"], item["label"]
    assert img.shape == (256, 512, 1)
    # IR radiometric window -> [0,1]; BICUBIC resize may overshoot slightly
    assert -0.2 <= img.min() and img.max() <= 1.2
    assert lab.shape == (256, 512) and lab.dtype == np.int64
    assert lab.max() <= 12


def test_freiburg_rgb_augmented(freiburg_root):
    ds = Freiburg(freiburg_root, "train", "RGB", transforms=train_transform())
    item = ds.get(1, np.random.default_rng(1))
    assert item["image"].shape == (256, 512, 3)
    # deterministic per (seed, index) rng
    item2 = ds.get(1, np.random.default_rng(1))
    np.testing.assert_array_equal(item["image"], item2["image"])


def test_freiburg_translation_mode(freiburg_root):
    ds = Freiburg(freiburg_root, "train", "RGB", transforms=train_transform(),
                  segmentation_mode=True,
                  translation_name="freiburg_rgb2ir_130epochs")
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (256, 512, 1)


def test_freiburg_test_npy_labels(freiburg_root):
    ds = FreiburgTest(freiburg_root, "test", "IR", transforms=val_transform())
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (256, 512, 1)
    assert item["label"].shape == (256, 512)


def test_cityscapes_remap(tmp_path):
    root = make_cityscapes_tree(str(tmp_path))
    ds = Cityscapes(root, transforms=val_transform())
    item = ds.get(0, np.random.default_rng(0))
    assert item["label"].max() <= 12  # 19-class ids merged into 13-class space
    # spot checks of the merge table
    assert remap_label(np.array([7]))[0] == 0
    assert remap_label(np.array([33]))[0] == 11
    assert remap_label(np.array([0]))[0] == 12   # unmapped -> ignore
    assert remap_label(np.array([26]))[0] == 10  # car -> vehicles


def test_kitti_unlabeled(tmp_path):
    root = make_kitti_tree(str(tmp_path))
    ds = Kitti(root, train_transform())
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (256, 512, 3)


def test_loader_batching_and_split(freiburg_root):
    ds = Freiburg(freiburg_root, "train", "IR", transforms=val_transform())
    train_idx, val_idx = split_indices(len(ds), 0.25, seed=42)
    assert len(val_idx) == 1 and len(train_idx) == 3
    loader = DataLoader(ds, batch_size=2, shuffle=True, indices=train_idx,
                        drop_last=True, seed=7)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["image"].shape == (2, 256, 512, 1)
    assert batches[0]["label"].shape == (2, 256, 512)
    # second epoch reshuffles deterministically
    b2 = list(loader)
    assert len(b2) == 1


def test_split_matches_reference_semantics():
    """np.random.seed(42)-shuffle split (segmentation_train.py:129-135)."""
    train_idx, val_idx = split_indices(10, 0.2, seed=42)
    indices = np.arange(10)
    rs = np.random.RandomState(42)
    rs.shuffle(indices)
    assert val_idx == indices[:2].tolist()
    assert train_idx == indices[2:].tolist()


def test_palette_png():
    pred = np.random.default_rng(0).integers(0, 13, size=(16, 32))
    img = colorize_prediction(pred)
    assert img.mode == "P" and img.size == (32, 16)


def test_freiburg_translation_pairs(tmp_path):
    """FreiburgT2S / FreiburgTranslation glob + label-derivation grammar."""
    import os
    from PIL import Image
    from thermal_semantic_segmentation_tpu.data.freiburg import FreiburgTranslationPairs

    root = str(tmp_path / "translations")
    folder = "test_run/"
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, folder), exist_ok=True)
    for i in range(3):
        img = rng.integers(0, 255, (40, 80, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, folder, f"{i}_translation.jpg"))
        lab = rng.integers(0, 13, (40, 80)).astype(np.uint8)
        Image.fromarray(lab, "L").save(os.path.join(root, folder, f"{i}_groundtruth.png"))
    ds = FreiburgTranslationPairs(folder, val_transform(), root=root)
    assert len(ds) == 3
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (256, 512, 3)
    assert item["label"].shape == (256, 512) and item["label"].max() <= 12


def test_multiple_apply_views():
    from PIL import Image
    from thermal_semantic_segmentation_tpu.data.transforms import MultipleApply
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (32, 48, 3)).astype(np.uint8))
    ma = MultipleApply([train_transform(), train_transform()])
    views, _ = ma(np.random.default_rng(0), img, None)
    assert len(views) == 2
    assert views[0].shape == (256, 512, 3)
    assert not np.array_equal(views[0], views[1])  # independent random draws


def test_cityscapes_translation_mode_paths(tmp_path):
    """train_mode=False returns the translation destination path
    (base_dataset.py:107-111 grammar)."""
    root = make_cityscapes_tree(str(tmp_path))
    ds = Cityscapes(root, transforms=val_transform(), train_mode=False)
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (256, 512, 3)
    assert "translation" in item["img_path"]
    assert "leftImg8bit" not in item["img_path"]


def test_loader_tolerates_truncated_png(tmp_path):
    """A truncated PNG must not kill the epoch (reference sets PIL
    LOAD_TRUNCATED_IMAGES=True at every entry point, main.py:17)."""
    root = make_freiburg_tree(str(tmp_path / "fr"), n_train=6)
    victim = f"{root}/train/seq_00_day/00/fl_ir_aligned/0002.png"
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:          # cut the file mid-IDAT
        f.write(data[: len(data) // 2])

    ds = Freiburg(root, "train", "IR", transforms=val_transform())
    loader = DataLoader(ds, 2, shuffle=False, drop_last=False, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert all(b["image"].shape == (2, 256, 512, 1) for b in batches)


def test_loader_substitutes_unreadable_file(tmp_path):
    """A file PIL cannot parse at all is deterministically replaced by
    another sample instead of aborting (loader corrupt_retries)."""
    root = make_freiburg_tree(str(tmp_path / "fr"), n_train=6)
    victim = f"{root}/train/seq_00_day/00/fl_ir_aligned/0001.png"
    with open(victim, "wb") as f:
        f.write(b"this is not a png at all")

    ds = Freiburg(root, "train", "IR", transforms=val_transform())
    loader = DataLoader(ds, 2, shuffle=False, drop_last=False, seed=0)
    run1 = [np.asarray(b["image"]) for b in loader]
    assert len(run1) == 3
    loader2 = DataLoader(ds, 2, shuffle=False, drop_last=False, seed=0)
    run2 = [np.asarray(b["image"]) for b in loader2]
    for a, b in zip(run1, run2):           # substitution is deterministic
        np.testing.assert_array_equal(a, b)

    strict = DataLoader(ds, 2, shuffle=False, drop_last=False, seed=0,
                        corrupt_retries=0)
    with pytest.raises(Exception):
        list(strict)


def test_loader_host_sharding():
    """shard=(i, n): disjoint per-host slices of each epoch, equal batch
    counts per host (lockstep), deterministic under the epoch shuffle."""
    from thermal_semantic_segmentation_tpu.data.loader import DataLoader

    class IdxDataset:
        def __len__(self):
            return 23

        def get(self, index, rng):
            return {"idx": np.asarray(index)}

    def epoch_indices(shard, seed=3):
        dl = DataLoader(IdxDataset(), 2, shuffle=True, drop_last=True,
                        seed=seed, shard=shard, num_threads=2)
        return dl, [int(i) for b in dl for i in b["idx"]]

    dl0, got0 = epoch_indices((0, 2))
    dl1, got1 = epoch_indices((1, 2))
    assert len(got0) == len(got1) == 10  # 23 -> 11 per host -> 5 batches x 2
    assert len(dl0) == len(dl1) == 5
    assert not (set(got0) & set(got1))  # disjoint
    # same epoch order on both hosts (same seed/epoch shuffle), so the union
    # is a prefix-truncated partition of the shuffled index set
    assert len(set(got0) | set(got1)) == 20
    # determinism: rebuilding gives the same slices
    _, again0 = epoch_indices((0, 2))
    assert got0 == again0


def test_loader_host_sharding_cover_all():
    """shard_lockstep=False: the slices still partition the dataset but
    nothing is truncated — every index appears exactly once across hosts
    (offline file-writing CLIs must process EVERY sample)."""
    from thermal_semantic_segmentation_tpu.data.loader import DataLoader

    class IdxDataset:
        def __len__(self):
            return 23

        def get(self, index, rng):
            return {"idx": np.asarray(index)}

    got = {}
    for sid in range(3):
        dl = DataLoader(IdxDataset(), 4, shuffle=False, drop_last=False,
                        shard=(sid, 3), shard_lockstep=False, num_threads=2)
        got[sid] = [int(i) for b in dl for i in b["idx"]]
        assert len(dl) == -(-len(got[sid]) // 4)
    all_idx = sum(got.values(), [])
    assert sorted(all_idx) == list(range(23))      # exact partition
    assert len(got[0]) == 8 and len(got[2]) == 7   # uneven shares allowed
