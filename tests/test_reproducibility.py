"""Run-level determinism: the same seed must reproduce the same training.

The reference offers no reproducibility story (unseeded DataLoader workers,
cudnn nondeterminism); here the whole pipeline is seeded — loader rng derives
from (seed, epoch, index), dropout keys from the step counter, init from the
seed flag — so two identical CLI invocations must produce *bit-identical*
checkpoints. This is a production property (rerun a job, get the same model)
and a tripwire for any future unseeded randomness sneaking into the loader,
augmentations, or train step.
"""

import os

from tests.synthetic import make_freiburg_tree
from thermal_semantic_segmentation_tpu.cli import segmentation_train


def test_seg_train_cli_bit_reproducible(tmp_path, monkeypatch):
    root = make_freiburg_tree(str(tmp_path / "freiburg"), n_train=12,
                              n_test=2)
    monkeypatch.chdir(tmp_path)

    def run(tag):
        ckpt_dir = str(tmp_path / f"ckpt_{tag}")
        segmentation_train.main([
            "-dataset", "freiburg_ir", "-epochs", "1", "-max_steps", "2",
            "-batch_size", "8", "-val_batch_size", "8",
            "--layers", "1,1,1,1", "--seed", "7",
            "-new_checkpoint_name", "repro.pth",
            "--freiburg_root", root, "--model_root_path", ckpt_dir,
            "-net_mode", "one_channel"])
        with open(os.path.join(ckpt_dir, "repro.pth"), "rb") as f:
            return f.read()

    first, second = run("a"), run("b")
    assert first == second, (
        "identical seeds produced different checkpoints — some stage "
        "(loader order, augmentation rng, dropout, optimizer) has picked "
        "up unseeded nondeterminism")
