"""Compact wire format for host->device batch transfer.

The host->HBM link is the input pipeline's scarcest resource (PCIe on a real
TPU VM; a ~30 MiB/s, high-latency tunnel under axon). The default feed
(`jax.device_put` per leaf) pays per-transfer latency for every array and
ships labels at integer width. This module packs a whole batch pytree into
ONE uint8 buffer of shape (B, bytes_per_sample):

- integer leaves are narrowed losslessly (range-checked per batch) to
  uint8/int16/int32; bool leaves travel as uint8 (values beyond int32 wrap
  exactly as x64-disabled jax.device_put of int64 already does);
- float64 leaves are cast to float32 (what x64-disabled jax would do on
  device_put anyway); float32 leaves travel as-is, or as bfloat16 when
  ``float_wire='bfloat16'`` (bit-identical end-to-end for bf16-compute steps,
  which cast inputs to bf16 at entry anyway; do NOT use it when a consumer
  needs the f32 input, e.g. on-device augmentation resampling);
- every leaf keeps its leading batch dimension, so the packed buffer shards
  over the data axis of a mesh exactly like the unpacked leaves would.

On device, a jitted unpack bitcasts each slice back and restores the
original dtypes (ints come back int32 — what x64-disabled jax gives for
int64 input anyway; floats come back float32). Packing is a host-side
memcpy; unpacking fuses into the consuming step's first uses.

The reference has no counterpart (single-GPU torch pin_memory); this is a
TPU-native input-feed optimization. Measured over the axon tunnel (batch 8,
256x512 IR + labels): per-leaf f32/int feed ~376 ms/batch -> packed ~100 ms.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ALIGN = 4  # pad each leaf's per-sample segment so 4-byte bitcasts stay legal


_INT_WIDTH_ORDER = ("uint8", "int16", "int32")


def _wire_dtype(arr: np.ndarray, float_wire: Optional[str],
                min_int: Optional[str] = None):
    """(wire numpy dtype, restore jnp dtype name) for one leaf.

    ``min_int``: floor for the integer wire width (one of _INT_WIDTH_ORDER).
    Integer narrowing is value-dependent per batch, so callers that want a
    STABLE spec across batches (one jitted unpack compile) thread a width
    memo through this floor — see PackedFeed.
    """
    if arr.dtype == np.bool_:
        return np.dtype(np.uint8), "bool"
    if np.issubdtype(arr.dtype, np.integer):
        lo = int(arr.min()) if arr.size else 0
        hi = int(arr.max()) if arr.size else 0
        if 0 <= lo and hi <= 255:
            name = "uint8"
        elif -32768 <= lo and hi <= 32767:
            name = "int16"
        else:
            name = "int32"
        if min_int is not None and (_INT_WIDTH_ORDER.index(min_int)
                                    > _INT_WIDTH_ORDER.index(name)):
            name = min_int
        return np.dtype(name), "int32"
    if arr.dtype == np.float64:
        arr_dtype = np.dtype(np.float32)
    else:
        arr_dtype = arr.dtype
    if arr_dtype == np.float32 and float_wire == "bfloat16":
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16), "float32"
    return np.dtype(arr_dtype), np.dtype(arr_dtype).name


def pack_batch(batch: Dict[str, Any], *, float_wire: Optional[str] = None,
               width_memo: Optional[Dict[int, str]] = None
               ) -> Tuple[list, np.ndarray, Tuple]:
    """Split ``batch`` into (host_leaves, packed uint8 (B, S) buffer, spec).

    host_leaves keeps non-array entries (paths, strings) untouched, in tree
    order. Integer leaves are narrowed by their per-batch value range, so the
    spec of a bare pack_batch call can differ between batches whose values
    straddle a width boundary; pass ``width_memo`` (a mutable dict keyed by
    array-leaf position, as PackedFeed does) to pin each leaf's width to the
    widest ever seen — then the spec changes at most twice per leaf over a
    run and the matching jitted unpack stops retracing."""
    leaves, treedef = jax.tree.flatten(batch)
    arrays, host, mask = [], [], []
    for leaf in leaves:
        # jax.Arrays are already device-resident: pass through untouched
        # (np.asarray would round-trip them through the host).
        arr = leaf if isinstance(leaf, np.ndarray) else None
        if arr is not None and arr.ndim >= 1 and arr.dtype != object:
            arrays.append(arr)
            mask.append(True)
        else:
            host.append(leaf)
            mask.append(False)
    if not arrays:
        return host, np.zeros((0, 0), np.uint8), (treedef, tuple(mask), ())
    b = arrays[0].shape[0]
    segs, entries, off = [], [], 0
    for pos, arr in enumerate(arrays):
        if arr.shape[0] != b:
            raise ValueError(
                f"pack_batch: leading dims differ ({arr.shape[0]} vs {b})")
        floor = width_memo.get(pos) if width_memo is not None else None
        wire, restore = _wire_dtype(arr, float_wire, min_int=floor)
        if width_memo is not None and restore == "int32":
            width_memo[pos] = wire.name
        flat = np.ascontiguousarray(arr.astype(wire, copy=False)
                                    ).reshape(b, -1).view(np.uint8)
        pad = (-flat.shape[1]) % _ALIGN
        if pad:
            flat = np.pad(flat, ((0, 0), (0, pad)))
        segs.append(flat)
        entries.append((off, tuple(arr.shape[1:]), wire.name, restore))
        off += flat.shape[1]
    packed = np.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]
    spec = (treedef, tuple(mask), tuple(entries))
    return host, packed, spec


def unpack_arrays(packed: jax.Array, entries) -> list:
    """Bitcast the device buffer back into array leaves (jit-friendly)."""
    b = packed.shape[0]
    out = []
    for off, tail, wire_name, restore_name in entries:
        wire = jnp.dtype(wire_name)
        n = int(np.prod(tail, dtype=np.int64))
        nbytes = n * wire.itemsize
        seg = jax.lax.slice_in_dim(packed, off, off + nbytes, axis=1)
        if wire.itemsize > 1:
            val = jax.lax.bitcast_convert_type(
                seg.reshape(b, n, wire.itemsize), wire)
        elif wire == jnp.uint8:
            val = seg
        else:
            val = jax.lax.bitcast_convert_type(seg, wire)
        out.append(val.reshape((b, *tail)).astype(jnp.dtype(restore_name)))
    return out


def unpack_batch(packed: jax.Array, host_leaves, spec):
    """Rebuild the batch pytree. Call on already-device-resident ``packed``
    (inside or outside jit — the bitcasts fuse into downstream consumers)."""
    treedef, mask, entries = spec
    it_a = iter(unpack_arrays(packed, entries))
    it_h = iter(host_leaves)
    leaves = [next(it_a) if m else next(it_h) for m in mask]
    return jax.tree.unflatten(treedef, leaves)


class PackedFeed:
    """Pack batches on host, ONE async device_put each, jitted unpack.

    >>> feed = PackedFeed(mesh)           # or PackedFeed() single-device
    >>> batch = feed.put(host_batch)      # device-resident, original dtypes

    ``put`` is async (returns before the transfer completes), so issuing the
    next batch's put before consuming the current one double-buffers the
    link exactly like data.device_pipeline.device_prefetch.
    """

    def __init__(self, mesh=None, *, float_wire: Optional[str] = None):
        from ..parallel.mesh import batch_sharding
        self.sharding = batch_sharding(mesh) if mesh is not None else None
        self.float_wire = float_wire
        # pins each int leaf's wire width to the widest seen, so a batch whose
        # values straddle a width boundary can't flip the spec back and forth
        # (bounded retraces; see pack_batch docstring)
        self._width_memo: Dict[int, str] = {}

    def put(self, batch: Dict[str, Any]):
        host_leaves, packed, spec = pack_batch(batch,
                                               float_wire=self.float_wire,
                                               width_memo=self._width_memo)
        if packed.size == 0:
            return batch
        if self.sharding is not None:
            # multi-host-correct placement: on a process-spanning mesh the
            # packed buffer is THIS PROCESS's batch shard and the global
            # batch is assembled across hosts (parallel.mesh.put_sharded).
            # NOTE the jitted unpack is then a multi-process SPMD program:
            # every host must derive the SAME spec, so int leaves whose value
            # range could straddle a wire-width boundary differently across
            # hosts (not the case for class labels, which always fit uint8)
            # should not ride a packed wire on multi-host runs.
            from ..parallel.mesh import put_sharded
            dev = put_sharded(packed, self.sharding)
        else:
            dev = jax.device_put(packed)
        treedef, mask, entries = spec
        arrays = _jitted_unpack(dev, entries)
        it_a, it_h = iter(arrays), iter(host_leaves)
        leaves = [next(it_a) if m else next(it_h) for m in mask]
        return jax.tree.unflatten(treedef, leaves)


# process-wide: jax.jit's own cache keys on (entries, shapes/shardings), so
# fresh PackedFeed instances per epoch never re-trace a seen batch layout
_jitted_unpack = jax.jit(unpack_arrays, static_argnums=1)
