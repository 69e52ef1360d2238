"""Torch export CLI: native checkpoints -> reference .pth schemas, roundtrip."""

import numpy as np
import pytest

import jax

from thermal_semantic_segmentation_tpu.cli.export_torch import main as export_main
from thermal_semantic_segmentation_tpu.cli._common import (
    load_seg_checkpoint, save_seg_checkpoint)
from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab

TINY = dict(num_classes=13, num_channels=1, layers=(1, 1, 1, 1),
            image_size=(64, 128))


def test_seg_export_roundtrips(tmp_path):
    import torch
    _, variables = create_deeplab(jax.random.key(0), **TINY)
    src = str(tmp_path / "native.pth")
    dst = str(tmp_path / "exported.pth")
    host_vars = jax.tree.map(np.asarray, variables)
    save_seg_checkpoint(src, host_vars, epoch=3, val_loss=0.5)

    export_main(["--kind", "seg", "--src", src, "--dst", dst])

    ckpt = torch.load(dst, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3 and ckpt["val_loss"] == 0.5
    assert "sem_net_state_dict" in ckpt
    # the exported file must load straight back through the torch-import path
    back_vars, meta = load_seg_checkpoint(dst)
    flat_a = jax.tree.leaves(jax.tree.map(np.asarray, host_vars))
    flat_b = jax.tree.leaves(jax.tree.map(np.asarray, back_vars))
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)


def test_gan_export_schema(tmp_path):
    import jax.numpy as jnp
    import torch
    from thermal_semantic_segmentation_tpu.core.checkpoint import save_checkpoint
    from thermal_semantic_segmentation_tpu.models.factory import (
        init_gan_net, patchgan, unet_256)
    from thermal_semantic_segmentation_tpu.models.torch_convert import (
        torch_gan_checkpoint_to_flax)

    key = jax.random.key(0)
    g = unet_256(output_nc=1)
    d = patchgan()
    ckpt = {"epoch": 7,
            "g_vars": {"s2t": jax.tree.map(
                np.asarray, init_gan_net(g, key, (1, 256, 512, 3)))},
            "d_vars": {"t": jax.tree.map(
                np.asarray, init_gan_net(d, key, (1, 256, 512, 1)))}}
    src = str(tmp_path / "g_native.pth")
    dst = str(tmp_path / "g_torch.pth")
    save_checkpoint(src, ckpt)

    export_main(["--kind", "gan", "--src", src, "--dst", dst])

    out = torch.load(dst, map_location="cpu", weights_only=False)
    assert out["epoch"] == 7
    assert set(out) == {"epoch", "net_g_s2t_state_dict", "net_d_t_state_dict"}
    back = torch_gan_checkpoint_to_flax(
        {k: ({kk: vv.numpy() for kk, vv in v.items()}
             if isinstance(v, dict) else v) for k, v in out.items()})
    for a, b in zip(jax.tree.leaves(ckpt["g_vars"]["s2t"]),
                    jax.tree.leaves(back["g_vars"]["s2t"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
