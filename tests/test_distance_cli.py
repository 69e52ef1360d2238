"""distance_evaluate CLI smoke (reference distance_evaluate.py).

Builds originals plus a near-identity translation (the uint8 render of the
same radiometric frame), so the scores have known targets: L1 ~ the uint8
quantization error, SSIM ~ 1.
"""

import os

import numpy as np
from PIL import Image

from thermal_semantic_segmentation_tpu.cli import distance_evaluate

IR_LO, IR_HI = 21800, 25000  # radiometric window (freiburg_dataset.py:78-81)


def _build_tree(root, n=10, seed=0):
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n):
        # exactly the protocol raw size (960, 320), so the loader's resize is
        # the identity and only the col 150:850 crop + window scaling apply
        ir = rng.integers(IR_LO, IR_HI, size=(320, 960)).astype(np.uint16)
        ori = os.path.join(root, "train", "seq_00_day", "00", "fl_ir_aligned",
                           f"{i:04d}.png")
        os.makedirs(os.path.dirname(ori), exist_ok=True)
        Image.fromarray(ir).save(ori)
        u8 = np.round((ir[:, 150:850].astype(np.float32) - IR_LO)
                      / (IR_HI - IR_LO) * 255.0).astype(np.uint8)
        trans = os.path.join(root, "t_gate", "seq_00_day", "00", "fl_rgb",
                             f"{i:04d}.png")
        os.makedirs(os.path.dirname(trans), exist_ok=True)
        Image.fromarray(u8, mode="L").save(trans)
        names.append(ori)
    lst = os.path.join(root, "image_list", "train_IR_data.txt")
    os.makedirs(os.path.dirname(lst), exist_ok=True)
    with open(lst, "w") as f:
        f.write("\n".join(names) + "\n")
    return root


def test_distance_evaluate_cli_near_identity(tmp_path, capsys):
    root = _build_tree(str(tmp_path / "freiburg"))
    l1, ssim = distance_evaluate.main([
        "-checkpoint_name", "t_gate.pth", "--freiburg_root", root,
        "-batch_size", "2"])
    assert l1 < 0.01, l1          # uint8 quantization only
    assert ssim > 0.95, ssim
    out = capsys.readouterr().out
    assert "Model: t_gate" in out and "L1 distance:" in out


def test_distance_evaluate_per_class_sees_scrambled_rare_class(tmp_path, capsys):
    """--per_class catches what the global L1 provably cannot: a rare class
    translated into the wrong intensity range. 3% of pixels (class 1) are
    corrupted by 0.5; the global L1 stays ~0.015 but the class-1 L1 is ~0.5."""
    root = str(tmp_path / "freiburg")
    rng = np.random.default_rng(0)
    names, label_names = [], []
    for i in range(10):
        ir = rng.integers(IR_LO, IR_HI, size=(320, 960)).astype(np.uint16)
        ori = os.path.join(root, "train", "seq_00_day", "00", "fl_ir_aligned",
                           f"{i:04d}.png")
        os.makedirs(os.path.dirname(ori), exist_ok=True)
        Image.fromarray(ir).save(ori)
        # label: class 1 is a narrow 10-px-wide strip (~3% of pixels)
        lab = np.zeros((320, 960), np.uint8)
        lab[:, 400:410] = 1
        lab_path = os.path.join(root, "train", "seq_00_day", "00",
                                "fl_rgb_labels", f"{i:04d}.png")
        os.makedirs(os.path.dirname(lab_path), exist_ok=True)
        Image.fromarray(lab, mode="L").save(lab_path)
        # translation = near-identity EXCEPT class 1, shifted by ~0.5
        u8 = np.round((ir[:, 150:850].astype(np.float32) - IR_LO)
                      / (IR_HI - IR_LO) * 255.0)
        u8[:, 250:260] = (u8[:, 250:260] + 128) % 256  # cols 400:410 - crop
        trans = os.path.join(root, "t_gate", "seq_00_day", "00", "fl_rgb",
                             f"{i:04d}.png")
        os.makedirs(os.path.dirname(trans), exist_ok=True)
        Image.fromarray(u8.astype(np.uint8), mode="L").save(trans)
        names.append(ori)
        label_names.append(lab_path)
    os.makedirs(os.path.join(root, "image_list"), exist_ok=True)
    with open(os.path.join(root, "image_list", "train_IR_data.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(root, "image_list", "train_IR_label.txt"), "w") as f:
        f.write("\n".join(label_names) + "\n")

    l1, _ = distance_evaluate.main([
        "-checkpoint_name", "t_gate.pth", "--freiburg_root", root,
        "-batch_size", "2", "--per_class", "true"])
    assert l1 < 0.05, l1  # the corruption is invisible globally
    out = capsys.readouterr().out
    vals = {}
    for line in out.splitlines():
        if line.startswith("translation per-class L1 "):
            name, v = line[len("translation per-class L1 "):].rsplit(": ", 1)
            vals[name] = float(v)
    assert vals["road,parking"] < 0.01, vals          # near-identity class
    assert vals["ground,sidewalk"] > 0.2, vals        # the scrambled class
    assert np.isnan(vals["sky"]), vals                # absent class -> nan


def test_near_black_translation_still_rescaled(tmp_path):
    """A uint8 frame whose every pixel is <= 1 must still be scored /255:
    a value-range heuristic alone would treat it as already-[0,1] floats."""
    from thermal_semantic_segmentation_tpu.data.simple import DistanceDataset

    root = str(tmp_path / "freiburg")
    ir = np.full((320, 960), IR_LO + 13, dtype=np.uint16)  # u8 render == 1
    ori = os.path.join(root, "train", "seq_00_day", "00", "fl_ir_aligned",
                       "0000.png")
    os.makedirs(os.path.dirname(ori))
    Image.fromarray(ir).save(ori)
    trans = os.path.join(root, "t_gate", "seq_00_day", "00", "fl_rgb",
                         "0000.png")
    os.makedirs(os.path.dirname(trans))
    Image.fromarray(np.ones((320, 700), dtype=np.uint8), mode="L").save(trans)
    lst = os.path.join(root, "image_list", "train_IR_data.txt")
    os.makedirs(os.path.dirname(lst))
    with open(lst, "w") as f:
        f.write(ori + "\n")
    item = DistanceDataset(root, "t_gate").get(0, np.random.default_rng(0))
    # scaled: 1/255 = 0.0039 vs original 13/3200 = 0.0041 — near-identical
    assert abs(float(item["translated"].mean())
               - float(item["original"].mean())) < 1e-3
    assert item["translated"].max() < 0.01  # NOT 1.0 (the unscaled bug)
