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
