"""Offline translator CLI (cli/translator.py): every source frame is
written, tail batches pad to one compiled shape, async writes complete.

The reference's translator.py is truncated (its loop never calls .save(),
translator.py:60-68); these tests pin the completed capability.
"""

import os

import numpy as np
from PIL import Image

import jax

from tests.synthetic import make_freiburg_tree
from thermal_semantic_segmentation_tpu.cli import translator
from thermal_semantic_segmentation_tpu.core.checkpoint import save_checkpoint
from thermal_semantic_segmentation_tpu.models.factory import (init_gan_net,
                                                              unet_256)


def _save_gan_checkpoint(path):
    model = unet_256(ngf=4, input_nc=3, output_nc=1)
    variables = init_gan_net(model, jax.random.key(0), (1, 256, 512, 3))
    save_checkpoint(path, {"epoch": 0, "g_vars": {"s2t": variables,
                                                  "t2s": variables}})


def test_translator_writes_every_frame_with_tail_batch(tmp_path):
    # 5 frames through batch 2: the tail batch must pad (one compiled
    # shape) and still write exactly its real row
    root = make_freiburg_tree(str(tmp_path / "freiburg"), n_train=5, n_test=1)
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    _save_gan_checkpoint(os.path.join(ckpt_dir, "g.pth"))
    # the checkpoint carries ngf=4 params: flax apply takes shapes from the
    # params, so the thin net runs regardless of the factory's ngf=64 init
    translator.main(["-dataset", "freiburg_rgb", "-batch_size", "2",
                     "-checkpoint_name", "g.pth",
                     "-input_nc", "3", "-output_nc", "1",
                     "-save_image_size", "64", "128",
                     "-translation_name_suffix", "",
                     "--freiburg_root", str(tmp_path / "freiburg"),
                     "--gan_model_root_path", ckpt_dir])
    out_dir = os.path.join(str(tmp_path / "freiburg"), "translation",
                           "seq_00_day", "00", "fl_rgb")
    written = sorted(os.listdir(out_dir))
    assert written == [f"{i:04d}.png" for i in range(5)]
    img = np.asarray(Image.open(os.path.join(out_dir, written[-1])))
    # save_image_size is (H, W) on the CLI; PIL reports (W, H) -> array (H, W)
    assert img.shape == (64, 128) and img.dtype == np.uint8
