"""Gate harness helpers (bench_all.py): tree version-stamping and per-class
translation fidelity.

Round-3 lessons these pin: a persistent gate workdir silently mixed trees
generated before a tests/synthetic.py edit with new code (VERDICT r3 weak
#3), and the GAN gate's global L1 criterion could not see two narrow classes
translated into wrong intensity slots (weak #1)."""

import json
import os

import numpy as np
from PIL import Image

import bench_all
from tests.synthetic import make_gan_freiburg_tree


def test_ensure_tree_stamps_and_reuses(tmp_path):
    root = str(tmp_path / "tree")
    bench_all.ensure_tree(root, make_gan_freiburg_tree, n_train=2, n_test=1,
                          seed=3, hw=(32, 96))
    manifest = os.path.join(root, "_tree_manifest.json")
    with open(manifest) as f:
        first = json.load(f)
    assert first["maker"] == "make_gan_freiburg_tree"
    mtime = os.path.getmtime(manifest)
    # same args: reused, not regenerated
    bench_all.ensure_tree(root, make_gan_freiburg_tree, n_train=2, n_test=1,
                          seed=3, hw=(32, 96))
    assert os.path.getmtime(manifest) == mtime


def test_ensure_tree_regenerates_and_invalidates_on_arg_change(tmp_path):
    root = str(tmp_path / "tree")
    stale_ckpt = str(tmp_path / "ckpt")
    stale_marker = str(tmp_path / "baseline.json")
    bench_all.ensure_tree(root, make_gan_freiburg_tree, n_train=2, n_test=1,
                          seed=3, hw=(32, 96))
    os.makedirs(stale_ckpt)
    open(os.path.join(stale_ckpt, "old.pth"), "w").close()
    open(stale_marker, "w").close()
    # changed args = different fingerprint: tree regenerates, derived
    # state (checkpoints, cached baselines) is wiped
    bench_all.ensure_tree(root, make_gan_freiburg_tree, n_train=3, n_test=1,
                          seed=3, hw=(32, 96),
                          invalidate=[stale_ckpt, stale_marker])
    assert not os.path.exists(stale_ckpt)
    assert not os.path.exists(stale_marker)
    frames = os.listdir(os.path.join(root, "train", "seq_00_day", "00",
                                     "fl_rgb"))
    assert len(frames) == 3


def _write_translations(root, permute=None):
    """Fake 'translations': the real IR mapped to [0,255], optionally with
    the band intensity slots permuted (the round-3 failure mode)."""
    base = os.path.join(root, "train", "seq_00_day", "00")
    t_dir = os.path.join(root, "translation", "seq_00_day", "00", "fl_rgb")
    os.makedirs(t_dir, exist_ok=True)
    for name in sorted(os.listdir(os.path.join(base, "fl_ir_aligned"))):
        ir = np.asarray(Image.open(
            os.path.join(base, "fl_ir_aligned", name)), np.float32)
        ir01 = (np.clip(ir, 21800.0, 25000.0) - 21800.0) / 3200.0
        if permute is not None:
            n = len(permute)
            slot = np.clip(np.floor(ir01 * n), 0, n - 1).astype(np.int64)
            frac = np.clip(ir01 * n - slot, 0, 1)
            ir01 = (np.asarray(permute, np.float32)[slot] + frac) / n
        h, w = ir01.shape
        c0, c1 = round(w * 150 / 960), round(w * 850 / 960)
        out = (ir01[:, c0:c1] * 255).astype(np.uint8)
        Image.fromarray(out).save(os.path.join(t_dir, name))


def test_per_class_fidelity_identity_and_permuted(tmp_path):
    root = str(tmp_path / "tree")
    make_gan_freiburg_tree(root, n_train=3, n_test=0, seed=7, hw=(64, 192))
    _write_translations(root)
    l1, slots = bench_all._per_class_fidelity(root)
    assert slots == [0, 1, 2, 3, 4], slots
    assert max(l1) < 0.05, l1  # uint8 quantization + band noise only

    # swap the two narrow classes' intensity slots: global L1 stays small
    # but the slot map must expose the scramble
    _write_translations(root, permute=[1, 0, 2, 3, 4])
    l1_p, slots_p = bench_all._per_class_fidelity(root)
    assert slots_p == [1, 0, 2, 3, 4], slots_p
    global_l1 = float(np.mean(l1_p))
    assert global_l1 < 0.15  # the scramble is nearly invisible globally
