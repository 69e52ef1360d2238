"""Double-buffered host->device batch streaming.

Wraps any batch iterator so the NEXT batch's host->HBM transfer overlaps the
current step's compute (the reference relies on torch pin_memory + worker
prefetch; here `jax.device_put` is issued one batch ahead, which is async, so
DMA rides under the running step).

``wire='packed'`` routes transfers through data.wire.PackedFeed: the whole
batch ships as ONE compact uint8 buffer (lossless int narrowing, one
device_put per batch) and is bitcast back on device — measured ~4x less
wall-clock per batch over the axon tunnel, and strictly fewer/smaller
transfers on any host. ``wire='packed_bf16'`` additionally ships float32
leaves as bfloat16 — only for bf16-compute consumers (see data/wire.py).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import jax

from ..parallel.mesh import batch_sharding


def device_prefetch(iterator: Iterable[dict], mesh=None, *, size: int = 2,
                    wire: Optional[str] = None) -> Iterator[dict]:
    """Yield device-resident batches with ``size`` transfers in flight."""
    import numpy as np

    if wire in ("packed", "packed_bf16"):
        from .wire import PackedFeed
        feed = PackedFeed(mesh, float_wire="bfloat16" if wire == "packed_bf16"
                          else None)
        put = feed.put
    elif wire is None or wire == "none":
        sharding = batch_sharding(mesh) if mesh is not None else None

        def put_leaf(x):
            if not isinstance(x, (np.ndarray, jax.Array)):
                return x  # strings / metadata stay on host
            if sharding is not None:
                # process-spanning meshes assemble the global batch from
                # each host's loader shard (parallel.mesh.put_sharded)
                from ..parallel.mesh import put_sharded
                return put_sharded(x, sharding)
            return jax.device_put(x)

        def put(batch):
            return jax.tree.map(put_leaf, batch)
    else:
        raise ValueError(f"unknown wire mode {wire!r}")

    it = iter(iterator)
    buf = []
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    for batch in it:
        out = buf.pop(0)
        buf.append(put(batch))
        yield out
    yield from buf
