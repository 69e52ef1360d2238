"""Leading-axis padding to a fixed batch shape.

Jitted programs keep ONE compiled shape when a drop_last=False loader emits
a partial tail batch — a second full-graph compile over the axon tunnel
costs minutes (CLAUDE.md). Callers pad inputs up to the compiled batch size
and slice outputs back to the real row count. (The reference instead drops
or recompiles the tail, e.g. generate_pseudo_label.py:33-38.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pad_rows(arr, n: int, fill=0):
    """Pad ``arr`` with ``fill``-valued rows on axis 0 up to ``n`` rows.

    No-op when ``arr`` already has ``n`` or more rows. Stays in the
    caller's array world: numpy in, numpy out; jax in, jax out.
    """
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr
    xp = np if isinstance(arr, np.ndarray) else jnp
    return xp.concatenate(
        [arr, xp.full((pad, *arr.shape[1:]), fill, dtype=arr.dtype)])


def pad_batch_dicts(batches, pad_to, fills, keep=()):
    """Generator: host-side pad each batch dict to ``pad_to`` rows.

    ``fills`` maps array keys to their pad fill value; listed keys go
    through ``pad_rows`` (no-op when ``pad_to`` is None or the batch is
    already full), ``keep`` keys pass through untouched, and the original
    row count rides along as ``real_bs`` (a plain int — stays host-side
    through the wire). Padding BEFORE the host->device transfer keeps
    every (possibly mesh-sharded) transfer one fixed, shardable shape;
    pad-after-transfer would device_put a ragged tail that cannot shard.
    """
    first_key = next(iter(fills))
    for b in batches:
        real_bs = b[first_key].shape[0]
        out = {"real_bs": real_bs}
        for k, fill in fills.items():
            arr = b[k]
            if pad_to is not None:
                arr = pad_rows(arr, pad_to, fill=fill)
            out[k] = arr
        for k in keep:
            out[k] = b.get(k)
        yield out
