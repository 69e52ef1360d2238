"""-sem_mode module2: semantic-consistency loss driven by this repo's own
segmentation_train checkpoints instead of the reference's zoo-pretrained
legacy DeepLabs (main.py:80-81).

The gates pretrain tiny module2 sem nets on their synthetic trees and freeze
them inside the GAN step — the machinery the reference built to pin the
translation's class->intensity mapping (train.py:197-206). Here: checkpoint
meta drives the sem-net architecture, the [0,1] input renormalization is
exact, and the CLI wiring runs a real fused step end-to-end.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from tests.synthetic import make_freiburg_tree
from tests.test_gan_cli import _narrow_nets


def _tiny_seg_ckpt(path, *, num_channels, seed=0):
    from thermal_semantic_segmentation_tpu.cli._common import save_seg_checkpoint
    from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab

    _, variables = create_deeplab(jax.random.key(seed), num_classes=13,
                                  num_channels=num_channels,
                                  layers=(1, 1, 1, 1))
    save_seg_checkpoint(path, variables, epoch=0,
                        layers=[1, 1, 1, 1], num_channels=num_channels,
                        num_classes=13)


def test_gan_to_seg_tensor_module2_rescale():
    from thermal_semantic_segmentation_tpu.train.gan import gan_to_seg_tensor

    x = jnp.asarray([[-1.0, 0.0, 1.0]])
    for domain in ("source", "target"):
        out = gan_to_seg_tensor(x, domain, "module2")
        np.testing.assert_allclose(np.asarray(out), [[0.0, 0.5, 1.0]])


def test_gan_cli_sem_module2_step(tmp_path, monkeypatch):
    _narrow_nets(monkeypatch)
    from thermal_semantic_segmentation_tpu.cli import main as gan_cli

    root = make_freiburg_tree(os.path.join(str(tmp_path), "freiburg"),
                              n_train=4, n_test=1)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(ckpt_dir)
    _tiny_seg_ckpt(os.path.join(ckpt_dir, "sem_s.pth"), num_channels=3)
    _tiny_seg_ckpt(os.path.join(ckpt_dir, "sem_t.pth"), num_channels=1, seed=1)

    gan_cli.main([
        "-source_dataset", "freiburg_rgb", "-target_dataset", "freiburg_ir",
        "-batch_size", "2", "-num_epoch", "1", "-max_steps", "1",
        "-checkpoint_name", "g.pth", "-new_checkpoint_name", "g.pth",
        "-sem_loss", "true", "-sem_mode", "module2",
        "-sem_checkpoint_s", os.path.join(ckpt_dir, "sem_s.pth"),
        "-sem_checkpoint_t", os.path.join(ckpt_dir, "sem_t.pth"),
        "-with_contour", "true",
        "--freiburg_root", root, "--gan_model_root_path", ckpt_dir])

    from thermal_semantic_segmentation_tpu.core.checkpoint import load_checkpoint
    ckpt = load_checkpoint(os.path.join(ckpt_dir, "g.pth"))
    assert set(ckpt["g_vars"]) == {"s2t", "t2s"}


def test_gan_cli_sem_module2_requires_both_checkpoints(tmp_path, monkeypatch):
    import pytest

    _narrow_nets(monkeypatch)
    from thermal_semantic_segmentation_tpu.cli import main as gan_cli

    root = make_freiburg_tree(os.path.join(str(tmp_path), "freiburg"),
                              n_train=4, n_test=1)
    with pytest.raises(SystemExit):
        gan_cli.main([
            "-source_dataset", "freiburg_rgb", "-target_dataset",
            "freiburg_ir", "-batch_size", "2", "-num_epoch", "1",
            "-sem_loss", "true", "-sem_mode", "module2",
            "--freiburg_root", root,
            "--gan_model_root_path", os.path.join(str(tmp_path), "ckpt")])
