"""Device mesh + sharding layout for the framework.

The reference is strictly single-device (SURVEY.md §5: no torch.distributed /
NCCL anywhere), so this module is a *new* first-class component: batch-sharded
data parallelism over a 1-D ``jax.sharding.Mesh`` axis ``"data"``. Params and
optimizer state are replicated; gradients and metric histograms reduce over ICI
via the collectives XLA inserts for pjit-sharded batch math.

Multi-host extension: call ``jax.distributed.initialize()`` before
``make_mesh()`` and the same axis spans DCN-connected hosts.

BatchNorm semantics under the mesh: reductions over the batch axis inside the
jitted step see the GLOBAL batch (XLA inserts the cross-replica collectives),
so BN here is synchronized batch norm by default. The single-device reference
trains BN per device trivially; its commented-out SyncBN import
(models/deeplabv2.py:10) is what this gives for free. Per-replica BN
(behavior-faithful to multi-GPU torch without SyncBN) is available via
``make_seg_train_step(bn_mode='per_replica', mesh=...)`` — a shard_map over
the 'data' axis with pmean'd grads/running-stats (train/seg.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DATA_AXIS,
              *, batch_size: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices.

    ``batch_size``: the PER-PROCESS batch the mesh will shard (single-process
    that is the global batch). When it does not divide over the visible
    devices (e.g. ``-batch_size 2`` on an 8-chip host), the mesh shrinks to
    the largest device count that divides the batch — with a loud warning,
    since the dropped chips idle — instead of letting ``shard_batch`` die
    later in an opaque XLA sharding error. A mesh that SPANS processes never
    shrinks (every host must contribute its devices or the collectives
    desync); those get a clear error up front when the per-process batch
    does not divide the per-process device count. Process-local meshes
    (``local_data_mesh``) shrink normally even on multi-host jobs — they
    form no cross-host collectives."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    n_proc = len({d.process_index for d in devices})
    if n_proc > 1:
        # multi-host: ``batch_size`` is the PER-PROCESS loader batch (each
        # host contributes its own shard via host_shard()-sharded loaders and
        # put_sharded assembles the nproc*batch_size global batch), so it
        # must divide this host's device count; shrinking is impossible
        # (every host must contribute all its devices or collectives desync)
        local = n // n_proc
        if batch_size is not None and batch_size % local:
            raise ValueError(
                f"per-process batch {batch_size} does not divide over the "
                f"{local} devices each of the {n_proc} processes holds; "
                f"pick a batch size that is a multiple of {local}")
        return Mesh(np.asarray(devices), (axis_name,))
    if batch_size is not None and n > 1 and batch_size % n:
        keep = max(d for d in range(1, n + 1) if batch_size % d == 0)
        import warnings
        warnings.warn(
            f"global batch {batch_size} does not divide over {n} devices; "
            f"using {keep} device(s) and leaving {n - keep} idle — "
            f"use a batch size that is a multiple of {n} to engage every "
            f"chip", stacklevel=2)
        devices = list(devices)[:keep]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(devices: Optional[Sequence[jax.Device]] = None, *,
                 spatial: int = 2) -> Mesh:
    """(data, spatial) mesh: batch dp x width-axis sp. Spatially-sharded convs
    get their halo exchanges inserted by XLA; use when per-chip batch would
    drop below 1 or activations exceed HBM at full resolution."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % spatial == 0, (n, spatial)
    return Mesh(np.asarray(devices).reshape(n // spatial, spatial),
                (DATA_AXIS, SPATIAL_AXIS))


def image_sharding(mesh: Mesh, *, spatial: bool = False) -> NamedSharding:
    """NHWC image sharding: batch over 'data', optionally W over 'spatial'."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, None, SPATIAL_AXIS, None))
    return NamedSharding(mesh, P(DATA_AXIS))


def label_sharding(mesh: Mesh, *, spatial: bool = False) -> NamedSharding:
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, None, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def init_distributed(**kwargs) -> bool:
    """Multi-host bring-up: call once per process before make_mesh(); the same
    'data' axis then spans DCN-connected hosts (coordinator address etc. come
    from TPU environment variables or kwargs — see jax.distributed.initialize).

    Idempotent: returns False (and leaves the live client alone) when the
    process is already part of a distributed runtime — chained in-process CLI
    invocations (the bench_all gates, the test suite) must not re-initialize,
    which jax rejects with a RuntimeError."""
    import jax

    try:
        from jax._src import distributed
        if distributed.global_state.client is not None:
            return False
    except Exception:
        pass  # private-module drift: fall through to the public-API fallback
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # public-API fallback if the private probe above ever stops working
        # after a JAX upgrade: jax rejects a second initialize with
        # RuntimeError('... already initialized'); treat that as idempotent
        # success, re-raise anything else (real bring-up failures).
        if "already initialized" in str(e).lower():
            return False
        raise
    return True


def host_shard() -> Optional[tuple]:
    """(process_index, process_count) for DataLoader(shard=...), or None when
    single-process. Each host then loads a disjoint slice of every epoch —
    the data side of multi-host 'data'-axis parallelism (the reference is
    single-process; no counterpart)."""
    n = jax.process_count()
    return (jax.process_index(), n) if n > 1 else None


def local_data_mesh(batch_size: Optional[int] = None) -> Mesh:
    """Mesh over THIS process's chips only — for offline inference CLIs
    (evaluate / pseudo-gen / translator / prototypes / serve) whose work is
    embarrassingly parallel across hosts: each process takes a disjoint
    loader shard (``host_shard``) and writes its own outputs, so the mesh
    must not span processes (no cross-host collectives are ever needed and
    per-host ``device_put`` stays addressable). Single-process, this is
    exactly ``make_mesh``."""
    return make_mesh(jax.local_devices(), batch_size=batch_size)


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh's devices belong to more than one process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def put_sharded(x, sharding: NamedSharding):
    """Place ONE host array under ``sharding`` with multi-host-correct
    semantics for batch-sharded data.

    Single-process (or a fully-addressable mesh): plain ``jax.device_put`` —
    ``x`` is the whole (global) value. When the mesh SPANS processes, ``x``
    is THIS PROCESS's shard — the slice its ``host_shard()``-sharded loader
    produced — and the global array (leading dim = sum of the per-process
    shards) is assembled via ``jax.make_array_from_process_local_data``.
    ``jax.device_put`` would silently mis-scope there: it treats its input
    as the GLOBAL value and slices each process's addressable part out of
    it, so every host would train on a fraction of its own local batch and
    the "global" batch would duplicate-and-drop samples.
    """
    if spans_processes(sharding.mesh):
        import numpy as np
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a pytree of host arrays with the batch dim sharded over the mesh.

    On a process-spanning mesh each process passes its LOCAL batch (what its
    ``host_shard()``-sharded loader yielded) and the result is the assembled
    global batch — see :func:`put_sharded`."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: put_sharded(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Place every leaf fully replicated over ``mesh``.

    PRNG key leaves (e.g. the device ImagePool's ring-buffer key,
    ops/image_pool.py) need special handling on process-spanning meshes:
    ``device_put`` onto a non-addressable sharding only accepts uncommitted
    regular arrays and host values (jax dispatch._device_put_sharding_impl),
    and extended-dtype key arrays are neither — so move the uint32 key data
    and re-wrap it. Same-impl wrap is a bitcast: the replicated sharding
    carries over.
    """
    sh = replicated(mesh)
    spanning = spans_processes(mesh)

    def put(x):
        dt = getattr(x, "dtype", None)
        if spanning and dt is not None and jnp.issubdtype(dt, dtypes.prng_key):
            data = jax.device_put(jax.random.key_data(x), sh)
            return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)
