"""Doctor CLI: dataset/checkpoint sanity checks (cli/doctor.py)."""

import os
import shutil

import numpy as np

import jax

from tests.synthetic import make_freiburg_tree
from thermal_semantic_segmentation_tpu.cli import doctor
from thermal_semantic_segmentation_tpu.cli._common import save_seg_checkpoint
from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab


def test_doctor_passes_on_healthy_tree(tmp_path, capsys):
    root = make_freiburg_tree(str(tmp_path / "freiburg"), n_train=2, n_test=1,
                              translation_name="translation")
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1))
    save_seg_checkpoint(os.path.join(ckpt_dir, "s.pth"),
                        jax.device_get(variables), epoch=0,
                        layers=[1, 1, 1, 1], num_channels=1, num_classes=13)
    rc = doctor.main(["--freiburg_root", root, "--model_root_path", ckpt_dir,
                      "-checkpoint_name", "s.pth",
                      "-translation_name", "translation",
                      "--check_backend", "false"])
    out = capsys.readouterr().out
    assert rc == 0 and "doctor: ok" in out
    assert "PASS  freiburg train IR" in out
    assert "PASS  seg checkpoint" in out
    assert "translated source (translation)" in out


def test_doctor_fails_on_broken_tree(tmp_path, capsys):
    root = make_freiburg_tree(str(tmp_path / "freiburg"), n_train=2, n_test=1)
    # the classic layout mistake: labels directory missing
    shutil.rmtree(os.path.join(root, "train", "seq_00_day", "00",
                               "fl_rgb_labels"))
    rc = doctor.main(["--freiburg_root", root, "--check_backend", "false"])
    out = capsys.readouterr().out
    assert rc == 1 and "doctor: FAIL" in out
    assert "FAIL" in out


def test_doctor_grammar_audit_and_recipe(tmp_path, capsys, monkeypatch):
    """The file-level grammar audit names the exact broken sibling, and a
    ready tree gets the north-star launch command (MIN_MIOU=0.52,
    reference self_train_main.py:53) — VERDICT r4 #6."""
    parent = tmp_path / "mnt"
    root = make_freiburg_tree(str(parent / "datasets" / "freiburg"),
                              n_train=3, n_test=1)
    rc = doctor.main(["--freiburg_root", root, "--check_backend", "false"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "grammar: train IR (day)" in out and "3 frames" in out
    assert "recipe: tree is ready" in out
    # absolute script path: full_pipeline.sh resolves its repo itself but
    # must run from a workdir containing datasets/freiburg
    import thermal_semantic_segmentation_tpu as pkg
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(pkg.__file__))), "recipes", "full_pipeline.sh")
    assert f"MIN_MIOU=0.52 {script}" in out
    assert f"cd {parent} && " in out  # tree is not ./datasets/freiburg

    # break ONE label sibling: the audit names it, the recipe is withheld
    os.remove(os.path.join(root, "train", "seq_00_day", "00",
                           "fl_rgb_labels", "0001.png"))
    rc = doctor.main(["--freiburg_root", root, "--check_backend", "false"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "1/3 label siblings missing" in out
    assert "fl_rgb_labels/0001.png" in out.replace(os.sep, "/")
    assert "recipe: tree NOT ready" in out


def test_doctor_recipe_paths_are_separator_safe(tmp_path, capsys):
    """A root whose parent merely ENDS in 'datasets' (no separator) must get
    the symlink advice, never a truncated 'cd /srv/thermal- &&' prefix; and
    test frames nested one level under ImagesIR stay legal (the grammar
    walks recursively, like data/list_files._walk_files)."""
    root = make_freiburg_tree(str(tmp_path / "thermal-datasets" / "freiburg"),
                              n_train=2, n_test=1)
    # nest the test split one directory deeper (os.walk grammar allows it)
    im_dir = os.path.join(root, "test", "day", "ImagesIR")
    lab_dir = os.path.join(root, "test", "day", "SegmentationClass")
    for d in (im_dir, lab_dir):
        os.makedirs(os.path.join(d, "seq_extra"), exist_ok=True)
        for f in sorted(os.listdir(d)):
            if os.path.isfile(os.path.join(d, f)):
                shutil.move(os.path.join(d, f),
                            os.path.join(d, "seq_extra", f))
    rc = doctor.main(["--freiburg_root", root, "--check_backend", "false"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "grammar: test IR (day)" in out
    assert "ln -s" in out             # not a datasets/freiburg layout
    launch = next(l for l in out.splitlines() if "MIN_MIOU=0.52" in l)
    assert "cd " not in launch        # no truncated-prefix cd
    assert f"ln -s {root} datasets/freiburg" in out


def test_doctor_warns_on_missing_root(tmp_path, capsys):
    rc = doctor.main(["--freiburg_root", str(tmp_path / "nope"),
                      "--check_backend", "false"])
    out = capsys.readouterr().out
    assert rc == 0  # warnings only
    assert "WARN  freiburg root" in out
