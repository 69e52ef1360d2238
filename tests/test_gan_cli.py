"""GAN trainer CLI (cli/main.py) smoke: wiring, checkpoint schema, resume.

Drives the real entry point (reference main.py / main_gan.py orchestration)
end-to-end on a synthetic Freiburg tree. The generators/discriminators are
narrowed (ngf/ndf 8) and the mesh shrunk to one device so a full fused
CycleGAN step fits the 1-core CI host; the chip gates (bench_all.py
gan_gate / pipeline_gate) run the real widths at scale.
"""

import os

import numpy as np

import jax

from tests.synthetic import make_freiburg_tree
from thermal_semantic_segmentation_tpu.core.checkpoint import load_checkpoint


def _narrow_nets(monkeypatch):
    import thermal_semantic_segmentation_tpu.cli.main as _m
    import thermal_semantic_segmentation_tpu.parallel.mesh as pmesh
    from thermal_semantic_segmentation_tpu.models import factory

    monkeypatch.setattr(
        _m, "unet_256",
        lambda ngf=64, **kw: factory.unet_256(ngf=8, **kw))
    monkeypatch.setattr(
        _m, "patchgan",
        lambda input_nc, dtype: factory.patchgan(ndf=8, input_nc=input_nc,
                                                 dtype=dtype))
    monkeypatch.setattr(pmesh, "make_mesh",
                        lambda *a, **k: pmesh.Mesh(
                            np.asarray(jax.devices()[:1]), ("data",)))


def test_gan_cli_trains_checkpoints_and_resumes(tmp_path, monkeypatch):
    _narrow_nets(monkeypatch)
    from thermal_semantic_segmentation_tpu.cli import main as gan_cli

    root = make_freiburg_tree(os.path.join(str(tmp_path), "freiburg"),
                              n_train=4, n_test=1)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    common = ["-source_dataset", "freiburg_rgb", "-target_dataset",
              "freiburg_ir", "-batch_size", "2", "-num_epoch", "1",
              "-max_steps", "1", "-checkpoint_name", "g.pth",
              "-new_checkpoint_name", "g.pth",
              "--freiburg_root", root, "--gan_model_root_path", ckpt_dir]
    gan_cli.main(common)

    path = os.path.join(ckpt_dir, "g.pth")
    ckpt = load_checkpoint(path)
    # reference key schema intent (main.py:128-136): both directions + both
    # discriminators for the full CycleGAN
    assert set(ckpt["g_vars"]) == {"s2t", "t2s"}
    assert set(ckpt["d_vars"]) == {"t", "s"}
    assert int(ckpt["epoch"]) == 0
    for net in ckpt["g_vars"].values():
        assert "params" in net and "batch_stats" in net

    before = jax.tree.leaves(ckpt["g_vars"]["s2t"]["params"])[0].copy()
    gan_cli.main(common + ["-load_model", "True"])
    resumed = load_checkpoint(path)
    # reference resume semantics (main.py:89-93,122): restart AT the saved
    # epoch, not after it — a resumed 1-epoch run re-trains epoch 0
    assert int(resumed["epoch"]) == 0
    after = jax.tree.leaves(resumed["g_vars"]["s2t"]["params"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_one_direction_gan_cli(tmp_path, monkeypatch):
    """main_gan.py counterpart: cycle=False trains only s2t / d_t."""
    _narrow_nets(monkeypatch)
    import thermal_semantic_segmentation_tpu.cli.main_gan as gan_one
    # main_gan shares cli/main's engine: narrow the nets there too
    root = make_freiburg_tree(os.path.join(str(tmp_path), "freiburg"),
                              n_train=4, n_test=1)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    gan_one.main(["-source_dataset", "freiburg_rgb", "-target_dataset",
                  "freiburg_ir", "-batch_size", "2", "-num_epoch", "1",
                  "-max_steps", "1", "-checkpoint_name", "g1.pth",
                  "-new_checkpoint_name", "g1.pth",
                  "--freiburg_root", root,
                  "--gan_model_root_path", ckpt_dir])
    ckpt = load_checkpoint(os.path.join(ckpt_dir, "g1.pth"))
    assert set(ckpt["g_vars"]) == {"s2t"}
    assert set(ckpt["d_vars"]) == {"t"}
