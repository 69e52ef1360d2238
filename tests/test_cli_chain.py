"""The self-training CLI chain end-to-end on the simulated mesh.

pseudo-label generation -> prototype calculation -> self_train_main,
seeded from a directly-saved tiny checkpoint (no training needed), on a
synthetic Freiburg tree with translated source frames. The chip gates
(bench_all.py selftrain_gate / pipeline_gate) run this at scale; this
smoke catches wiring/flag regressions without a TPU.
"""

import os

import numpy as np

import jax

from tests.synthetic import make_freiburg_tree
from thermal_semantic_segmentation_tpu.cli import (cal_prototype,
                                                   generate_pseudo_label,
                                                   self_train_main)
from thermal_semantic_segmentation_tpu.cli._common import save_seg_checkpoint
from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab


def test_pseudo_proto_selftrain_chain(tmp_path, monkeypatch):
    # This smoke tests CLI WIRING (flags, checkpoint meta, artifact paths),
    # not the protocol: on the 1-core CI host the real 256x512 shapes cost
    # ~20 min, so shrink the world — 1-device mesh (sharding is covered by
    # test_parallel + dryrun_multichip), tiny transforms (the chip gates in
    # bench_all.py run the full protocol end-to-end).
    import thermal_semantic_segmentation_tpu.parallel.mesh as pmesh
    from thermal_semantic_segmentation_tpu.cli import (cal_prototype as _cp,
                                                       generate_pseudo_label
                                                       as _gp,
                                                       self_train_main as _st)
    from thermal_semantic_segmentation_tpu.data import transforms as T
    monkeypatch.setattr(pmesh, "make_mesh",
                        lambda *a, **k: pmesh.Mesh(
                            np.asarray(jax.devices()[:1]), ("data",)))

    def tiny_val():
        return T.Compose([T.Resize((128, 64)), T.ToArray()])

    def tiny_train():
        return T.Compose([
            T.RandomResizedCrop(size=(64, 128), ratio=(1.5, 8 / 3.),
                                scale=(0.5, 1.0)),
            T.RandomHorizontalFlip(), T.ToArray()])

    class TinyT:
        def __getattr__(self, name):
            return getattr(T, name)

        @staticmethod
        def Resize(size):
            return T.Resize((128, 64))

    monkeypatch.setattr(_gp, "val_transform", tiny_val)
    monkeypatch.setattr(_st, "val_transform", tiny_val)
    monkeypatch.setattr(_st, "train_transform", tiny_train)
    monkeypatch.setattr(_cp, "T", TinyT())

    root = str(tmp_path)
    freiburg = make_freiburg_tree(os.path.join(root, "datasets", "freiburg"),
                                  n_train=4, n_test=2,
                                  translation_name="translation")
    ckpt_dir = os.path.join(root, "ckpt")
    os.makedirs(ckpt_dir)
    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1))
    save_seg_checkpoint(os.path.join(ckpt_dir, "src.pth"),
                        jax.device_get(variables), epoch=0,
                        layers=[1, 1, 1, 1], num_channels=1, num_classes=13)

    common = ["--freiburg_root", freiburg, "--model_root_path", ckpt_dir,
              "-checkpoint_name", "src.pth"]
    # no --layers anywhere below: the checkpoint meta must configure it.
    # batch 4 / 4 imgs / flip-TTA on the soft pass only: this smoke runs
    # B=4 256x512 convs on one CPU core, so every forward pass counts —
    # the chip gates (bench_all.py pipeline_gate) cover the full protocol.
    for soft, ptype, flip in (("True", "soft", "True"),
                              ("False", "hard", "False")):
        generate_pseudo_label.main(["--root", root, "--soft", soft,
                                    "-pseudo_type", ptype, "--flip", flip,
                                    "-batch_size", "4", *common])
    pl = os.path.join(root, "pseudo_labels")
    assert len(os.listdir(os.path.join(pl, "soft", "src"))) == 4
    hard = os.listdir(os.path.join(pl, "hard", "src"))
    assert len([f for f in hard if f.endswith(".png")
                and "color" not in f]) == 4

    cal_prototype.main(["-root", root, "-dataset", "freiburg_ir",
                        "-epochs", "1", "-batch_size", "4", "-max_steps", "1",
                        "-net_mode", "one_channel", *common])

    # --data_parallel exercises the sharded-validation wiring too (the
    # monkeypatched 1-device mesh keeps it cheap; real sharding is covered
    # by test_seg_train.test_validate_sharded_matches_unsharded)
    self_train_main.main(["--root", root,
                          "-new_checkpoint_name", "adapted.pth",
                          "-translation_name", "translation",
                          "--epochs", "1", "-max_steps", "1",
                          "--val_interval", "1000", "--resize", "128",
                          "--rcrop", "128", "64", "--data_parallel", "true",
                          "-batch_size", "4", *common])
    out = os.path.join(ckpt_dir, "lastadapted.pth")
    assert os.path.exists(out)
    from thermal_semantic_segmentation_tpu.cli._common import \
        load_seg_checkpoint
    back, meta = load_seg_checkpoint(out)
    assert [int(x) for x in meta["layers"]] == [1, 1, 1, 1]
    assert np.asarray(meta["objective_vectors"]).shape == (13, 256)

    # resume from a SELF-TRAIN checkpoint (best/last/preempt_): prototypes
    # and the best-mIoU threshold come from its meta — no prototype artifact
    # exists under this checkpoint name, so this also proves the fallback
    # prototype_path load is skipped. Pseudo-label paths must be passed
    # explicitly (they re-derive from the checkpoint name by default).
    pl_root = os.path.join(root, "pseudo_labels")
    self_train_main.main(["--root", root,
                          "-new_checkpoint_name", "adapted2.pth",
                          "-translation_name", "translation",
                          "--epochs", "1", "-max_steps", "1",
                          "--val_interval", "1000", "--resize", "128",
                          "--rcrop", "128", "64", "-batch_size", "4",
                          "--path_soft", os.path.join(pl_root, "soft", "src"),
                          "--path_lp", os.path.join(pl_root, "hard", "src"),
                          "--freiburg_root", freiburg,
                          "--model_root_path", ckpt_dir,
                          "-checkpoint_name", "lastadapted.pth"])
    assert os.path.exists(os.path.join(ckpt_dir, "lastadapted2.pth"))
