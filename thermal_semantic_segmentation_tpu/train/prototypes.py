"""Class-prototype computation over a frozen segmenter
(reference cal_prototype.py:21-169).

Per batch one jitted call produces per-sample per-class masked feature means
(MXU one-hot matmul) and folds them into the running prototypes in-graph —
replacing the reference's per-(sample, class) Python loop with .item() syncs
(cal_prototype.py:131-144). Update mode is 'mean' (running average), matching
calc_prototype's explicit 'mean' argument (cal_prototype.py:75).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.class_means import fold_prototypes, masked_class_means


def make_prototype_step(model, *, num_classes: int, feat_dim: int = 256):
    @jax.jit
    def step(variables, prototypes, counts, images):
        out = model.apply(variables, images, train=False)
        vectors, valid = masked_class_means(out["feat"], out["out"],
                                            num_classes=num_classes)
        return fold_prototypes(prototypes, counts, vectors, valid, mode="mean")

    return step


def calc_prototypes(model, variables, loader, *, num_classes: int = 13,
                    feat_dim: int = 256, epochs: int = 1,
                    max_steps: int = 0,
                    wire: str | None = "packed",
                    mesh=None) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (prototypes (C, F), counts (C,)) as numpy arrays.

    ``mesh``: shard each batch over the mesh's data axis (the loader runs
    drop_last=True, so every batch is full-size); the per-class feature
    sums/counts reduce across chips inside the jitted step and the
    accumulators come back replicated. ``variables`` should be
    mesh-replicated by the caller."""
    from ..data.device_pipeline import device_prefetch

    step = make_prototype_step(model, num_classes=num_classes, feat_dim=feat_dim)
    prototypes = jnp.zeros((num_classes, feat_dim), jnp.float32)
    counts = jnp.zeros((num_classes,), jnp.float32)

    def _checked(batches):
        # fail with a clear message instead of the opaque XLA divisibility
        # error the sharded transfer would raise mid-run
        for b in batches:
            if mesh is not None and b["image"].shape[0] % mesh.size:
                raise ValueError(
                    f"sharded prototype computation needs batches divisible "
                    f"by the {mesh.size}-device mesh; got "
                    f"{b['image'].shape[0]} (use drop_last=True with a "
                    f"divisible batch size)")
            yield b

    for epoch in range(epochs):
        for i, batch in enumerate(device_prefetch(_checked(iter(loader)),
                                                  mesh, wire=wire)):
            if max_steps and i >= max_steps:
                break
            prototypes, counts = step(variables, prototypes, counts,
                                      jnp.asarray(batch["image"]))
            if i % 10 == 0:
                print(f"epoch [{epoch}], prototype calculation: [{i}/{len(loader)}]")
    return merge_process_prototypes(np.asarray(prototypes), np.asarray(counts))


def merge_process_prototypes(prototypes: np.ndarray, counts: np.ndarray,
                             max_count: float | None = None
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Combine per-process partial prototypes on multi-host runs.

    Under ``--distributed`` each process folds only its own dataset shard
    (DataLoader ``shard=host_shard()``); the 'mean'-mode fold keeps a
    count-weighted running mean per class, so the exact global result is the
    count-weighted average of the per-process partials:
    ``sum_p(proto_p * n_p) / sum_p(n_p)``. This equals the unsharded
    sequential fold bit-for-bits modulo float summation order whenever no
    class count saturates ``max_count`` (3000, cal_prototype.py:93 momentum
    regime) — past saturation both orderings are history-dependent anyway.
    The merged counts are re-clamped to ``max_count`` so the persisted
    checkpoint never carries a count the single-process fold
    (ops/class_means.py:87) could not produce — anything resuming a fold
    from the saved counts keeps the same per-sample weight regime.
    Single-process: returns the inputs untouched.
    """
    import jax

    if jax.process_count() == 1:
        return prototypes, counts
    from jax.experimental import multihost_utils

    all_p = np.asarray(multihost_utils.process_allgather(prototypes))  # (P,C,F)
    all_n = np.asarray(multihost_utils.process_allgather(counts))      # (P,C)
    total = all_n.sum(axis=0)                                          # (C,)
    weighted = (all_p * all_n[..., None]).sum(axis=0)                  # (C,F)
    merged = weighted / np.maximum(total, 1.0)[:, None]
    if max_count is None:
        from ..ops.class_means import MAX_PROTOTYPE_COUNT
        max_count = MAX_PROTOTYPE_COUNT  # the fold's own cap, one source
    total = np.minimum(total, max_count)
    return merged.astype(prototypes.dtype), total.astype(counts.dtype)
