"""Checkpointing with the reference's schema capabilities.

The reference writes torch.save dicts with flow-specific keys (SURVEY.md §5):
  - seg:        {'epoch', 'sem_net_state_dict', 'val_loss'}
  - GAN:        {'epoch', 'net_g_s2t_state_dict', ..., 6 nets}
  - self-train: adds {'highest_mean_iu', 'objective_vectors'}
  - prototypes: a bare [13, 256] tensor

Here checkpoints are msgpack files (flax.serialization) holding a dict of
pytrees plus scalar metadata, written atomically. Unlike the reference,
optimizer state IS checkpointed (restart-safe; documented divergence —
the reference silently reinitializes Adam moments on resume).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict

import numpy as np
from flax import serialization


def _to_numpy(tree):
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Atomically write a dict of pytrees/scalars to ``path`` (msgpack)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.msgpack_serialize(_to_numpy(payload))
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class AsyncCheckpointer:
    """Non-blocking checkpoint writes via a background thread.

    Training never stalls on host IO: ``save`` snapshots the (host-fetched)
    payload and returns; the previous write is awaited first so at most one
    write is in flight (restart safety the reference lacks — it torch.saves
    synchronously in the epoch loop, main.py:128-136).
    """

    def __init__(self):
        import threading
        self._threading = threading
        self._thread = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def save(self, path: str, payload: Dict[str, Any]) -> None:
        self.wait()
        host_payload = _to_numpy(payload)
        self._thread = self._threading.Thread(
            target=save_checkpoint, args=(path, host_payload), daemon=True)
        self._thread.start()


def save_sharded(path: str, payload: Any) -> None:
    """Multi-host sharded checkpoint via orbax: every process writes only its
    address-local shards in parallel (no host gather, no single-writer
    bottleneck) — the multi-host complement to the msgpack format above.
    ``path`` becomes a directory; absolute paths required by orbax."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def abstract_like(tree, sharding=None):
    """ShapeDtypeStruct pytree for ``load_sharded`` targets. Each leaf keeps
    its own sharding (live distributed arrays) unless ``sharding`` overrides."""
    import jax

    def leaf(x):
        sh = sharding if sharding is not None else getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

    return jax.tree.map(leaf, tree)


def load_sharded(path: str, target: Any) -> Any:
    """Restore a sharded checkpoint directly into the shardings described by
    ``target`` (a ShapeDtypeStruct pytree from ``abstract_like``): each
    process reads only the shards it owns."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def maybe_load_torch_checkpoint(path: str):
    """Load a reference ``torch.save`` checkpoint if torch is available.

    Returns the raw dict (state_dicts as tensors) or raises ImportError.
    """
    import torch  # local import: torch is a conversion-only dependency

    return torch.load(path, map_location="cpu", weights_only=False)
