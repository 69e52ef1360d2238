"""Checkpoint round-trips: sync, async, torch interop."""

import os

import numpy as np
import pytest

from thermal_semantic_segmentation_tpu.core.checkpoint import (
    AsyncCheckpointer, load_checkpoint, save_checkpoint)


def test_roundtrip(tmp_path):
    payload = {"epoch": 3, "val_loss": 0.5,
               "variables": {"params": {"w": np.arange(6.0).reshape(2, 3)}}}
    p = str(tmp_path / "ck.msgpack")
    save_checkpoint(p, payload)
    back = load_checkpoint(p)
    assert back["epoch"] == 3
    np.testing.assert_array_equal(back["variables"]["params"]["w"],
                                  payload["variables"]["params"]["w"])


def test_atomic_overwrite(tmp_path):
    p = str(tmp_path / "ck")
    save_checkpoint(p, {"v": np.ones(4)})
    save_checkpoint(p, {"v": np.zeros(4)})
    np.testing.assert_array_equal(load_checkpoint(p)["v"], np.zeros(4))


def test_async_checkpointer(tmp_path):
    ck = AsyncCheckpointer()
    p = str(tmp_path / "a")
    for i in range(3):
        ck.save(p, {"step": i, "v": np.full(8, float(i))})
    ck.wait()
    back = load_checkpoint(p)
    assert back["step"] == 2
    np.testing.assert_array_equal(back["v"], np.full(8, 2.0))


def test_torch_checkpoint_loading(tmp_path):
    torch = pytest.importorskip("torch")
    from thermal_semantic_segmentation_tpu.core.checkpoint import (
        maybe_load_torch_checkpoint)
    p = str(tmp_path / "t.pth")
    torch.save({"epoch": 7, "sem_net_state_dict": {"x": torch.ones(3)}}, p)
    ck = maybe_load_torch_checkpoint(p)
    assert ck["epoch"] == 7
    np.testing.assert_array_equal(ck["sem_net_state_dict"]["x"].numpy(), np.ones(3))


def test_seg_checkpoint_resume_roundtrip(tmp_path):
    """save_seg_checkpoint/load_seg_checkpoint preserve variables + meta."""
    from thermal_semantic_segmentation_tpu.cli._common import (
        load_seg_checkpoint, save_seg_checkpoint)
    variables = {"params": {"w": np.arange(4.0)}, "batch_stats": {"m": np.ones(2)}}
    p = str(tmp_path / "seg.pth")
    save_seg_checkpoint(p, variables, epoch=9, val_loss=0.25)
    back, meta = load_seg_checkpoint(p)
    assert int(meta["epoch"]) == 9 and abs(float(meta["val_loss"]) - 0.25) < 1e-9
    np.testing.assert_array_equal(back["params"]["w"], variables["params"]["w"])
    np.testing.assert_array_equal(back["batch_stats"]["m"],
                                  variables["batch_stats"]["m"])


def test_sharded_checkpoint_roundtrip(tmp_path):
    """orbax sharded save/restore over the 8-device mesh: batch-sharded and
    replicated arrays come back with their shardings intact."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from thermal_semantic_segmentation_tpu.core.checkpoint import (
        abstract_like, load_sharded, save_sharded)
    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())
    tree = {
        "params": {"w": jax.device_put(jnp.arange(32.0).reshape(8, 4), data_sh)},
        "opt": {"mu": jax.device_put(jnp.ones((3, 3)), repl_sh)},
        "step": jax.device_put(jnp.asarray(7, jnp.int32), repl_sh),
    }
    path = str(tmp_path / "sharded_ckpt")
    save_sharded(path, tree)

    restored = load_sharded(path, abstract_like(tree))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    np.testing.assert_array_equal(np.asarray(restored["opt"]["mu"]),
                                  np.asarray(tree["opt"]["mu"]))
    assert int(restored["step"]) == 7
    assert restored["params"]["w"].sharding == data_sh
    assert restored["opt"]["mu"].sharding.is_fully_replicated

    # resharding on restore: replicate what was batch-sharded
    restored2 = load_sharded(path, abstract_like(tree, sharding=repl_sh))
    assert restored2["params"]["w"].sharding.is_fully_replicated


def test_model_meta_roundtrip(tmp_path):
    """Architecture keys persisted with the checkpoint override stale CLI
    flags at load (a mismatched --layers otherwise dies as an opaque flax
    param-tree error deep in apply)."""
    from argparse import Namespace

    from thermal_semantic_segmentation_tpu.cli._common import (
        apply_model_meta, load_seg_checkpoint, model_meta,
        save_seg_checkpoint)

    train_args = Namespace(layers=(1, 1, 1, 1), net_mode="three_channels",
                           num_classes=5)
    p = str(tmp_path / "meta.pth")
    save_seg_checkpoint(p, {"params": {"w": np.zeros(1)}}, epoch=0,
                        **model_meta(train_args))
    _, meta = load_seg_checkpoint(p)
    eval_args = Namespace(layers=(3, 4, 23, 3), net_mode="one_channel",
                          num_classes=13)
    apply_model_meta(eval_args, meta)
    assert eval_args.layers == (1, 1, 1, 1)
    assert eval_args.net_mode == "three_channels"  # from num_channels=3
    assert eval_args.num_classes == 5
    # reference torch checkpoints carry no arch keys: flags stay untouched
    apply_model_meta(eval_args, {"epoch": 3})
    assert eval_args.layers == (1, 1, 1, 1)


def test_eval_cli_adopts_layers_from_checkpoint(tmp_path, monkeypatch):
    """Train with --layers 1,1,1,1 through the CLI, then evaluate WITHOUT
    repeating the flag: the checkpoint's stored architecture must win."""
    from tests.synthetic import make_freiburg_tree
    from thermal_semantic_segmentation_tpu.cli import (segmentation_evaluate,
                                                       segmentation_train)

    # batch 8: the test mesh is 8 simulated devices (dp-sharded batch)
    root = make_freiburg_tree(str(tmp_path / "freiburg"), n_train=12,
                              n_test=2)
    monkeypatch.chdir(tmp_path)
    common = ["--freiburg_root", root, "--model_root_path",
              str(tmp_path / "ckpt"), "-net_mode", "one_channel"]
    segmentation_train.main([
        "-dataset", "freiburg_ir", "-epochs", "1", "-max_steps", "1",
        "-batch_size", "8", "-val_batch_size", "8", "--layers", "1,1,1,1",
        "-new_checkpoint_name", "tiny.pth", *common])
    # no --layers here: the default (3,4,23,3) would shape-mismatch
    segmentation_evaluate.main([
        "-dataset", "freiburg_ir", "-val_batch_size", "8",
        "-checkpoint_name", "tiny.pth", *common])


def test_multihost_checkpoint_writes_are_primary_only(tmp_path, monkeypatch):
    """On multi-host runs every process executes the trainer loop; only
    process 0 may write the (shared-filesystem) msgpack checkpoint."""
    import jax

    from thermal_semantic_segmentation_tpu.cli._common import (
        primary_host, save_seg_checkpoint)

    p = str(tmp_path / "only_primary.pth")
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert primary_host() is False
    save_seg_checkpoint(p, {"params": {"w": np.zeros(1)}}, epoch=0)
    assert not os.path.exists(p)

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert primary_host() is True
    save_seg_checkpoint(p, {"params": {"w": np.zeros(1)}}, epoch=0)
    assert os.path.exists(p)
