"""Checkpoint round-trips: sync, async, torch interop."""

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
