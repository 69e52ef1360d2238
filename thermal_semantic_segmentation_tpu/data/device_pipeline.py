"""Double-buffered host->device batch streaming.

Wraps any batch iterator so the NEXT batch's host->HBM transfer overlaps the
current step's compute (the reference relies on torch pin_memory + worker
prefetch; here `jax.device_put` is issued one batch ahead, which is async, so
DMA rides under the running step).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax

from ..parallel.mesh import batch_sharding


def device_prefetch(iterator: Iterable[dict], mesh=None, *, size: int = 2) -> Iterator[dict]:
    """Yield device-resident batches with ``size`` transfers in flight."""
    sharding = batch_sharding(mesh) if mesh is not None else None

    import numpy as np

    def put_leaf(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x  # strings / metadata stay on host
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    def put(batch):
        return jax.tree.map(put_leaf, batch)

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
