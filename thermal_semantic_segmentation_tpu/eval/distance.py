"""Translation-quality evaluation: L1 + SSIM between originals and their
translations over the seed-42 20% split (reference distance_evaluate.py).

Extension over the reference: optional per-class L1 over label masks. The
reference only reports a global mean, which provably cannot see a rare class
translated into another class's intensity range (measured on the round-3
synthetic pipeline gate: global L1 ratio 0.334 "passed" while 2 of 5 classes
were scrambled and the downstream adaptation collapsed to 0.38 mIoU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ssim import ssim
from ..utils.meters import AverageMeter


@jax.jit
def _pair_metrics(ori, trans):
    l1 = jnp.mean(jnp.abs(ori.astype(jnp.float32) - trans.astype(jnp.float32)))
    return l1, ssim(ori, trans, data_range=1.0)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def _per_class_l1_sums(ori, trans, label, *, num_classes: int):
    """(per-class |ori-trans| sums, per-class pixel counts).

    One-hot contraction, not a gather/segment_sum: TPU index gathers at
    image shapes are ~30x slower than the equivalent multiply-reduce
    (see ops/confmat.py, losses/__init__.py for the same pattern).
    """
    diff = jnp.mean(jnp.abs(ori.astype(jnp.float32)
                            - trans.astype(jnp.float32)), axis=-1)  # (B,H,W)
    oh = jax.nn.one_hot(label, num_classes, dtype=jnp.float32)      # (B,H,W,K)
    sums = jnp.einsum("bhw,bhwk->k", diff, oh)
    counts = jnp.sum(oh, axis=(0, 1, 2))
    return sums, counts


def evaluate_distance(loader, *, wire: str | None = "packed",
                      num_classes: int | None = None,
                      reduce_processes: bool = False):
    """Returns (avg_l1, avg_ssim), or (avg_l1, avg_ssim, per_class_l1) when
    ``num_classes`` is given — per_class_l1[k] is the mean |ori - trans| over
    pixels labeled k (nan for classes absent from the split), and the loader's
    batches must carry a ``label`` key (DistanceDataset(with_label=True)).

    ``reduce_processes``: set when the caller sharded the DATASET per process
    (DataLoader ``shard=host_shard()``): sample-weighted L1 / batch-weighted
    SSIM sums and the per-class accumulators reduce across processes, so
    every process returns the same global scores (same pattern as
    eval/validate.seg_validate)."""
    from ..data.device_pipeline import device_prefetch

    distances = AverageMeter("distance", ":3.4f")
    ssim_scores = []
    cls_sums = cls_counts = None
    for batch in device_prefetch(iter(loader), wire=wire):
        ori = jnp.asarray(batch["original"])
        trans = jnp.asarray(batch["translated"])
        l1, s = _pair_metrics(ori, trans)
        distances.update(float(l1), ori.shape[0])
        ssim_scores.append(float(s))
        if num_classes is not None:
            sums, counts = _per_class_l1_sums(
                ori, trans, jnp.asarray(batch["label"]),
                num_classes=num_classes)
            cls_sums = sums if cls_sums is None else cls_sums + sums
            cls_counts = counts if cls_counts is None else cls_counts + counts
    k = num_classes or 0
    sums = np.asarray(cls_sums) if cls_sums is not None else np.zeros(k)
    counts = np.asarray(cls_counts) if cls_counts is not None else np.zeros(k)
    l1_sum, l1_n = distances.sum, distances.count
    ssim_sum, ssim_n = float(np.sum(ssim_scores)), len(ssim_scores)
    if reduce_processes and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        stats = np.concatenate([[l1_sum, l1_n, ssim_sum, ssim_n],
                                sums.ravel(), counts.ravel()]).astype(np.float64)
        stats = np.asarray(multihost_utils.process_allgather(stats)).sum(axis=0)
        l1_sum, l1_n, ssim_sum, ssim_n = stats[:4]
        sums, counts = stats[4:4 + k], stats[4 + k:]
    # nan, not 0.0, when nothing was evaluated: an empty shard/split must
    # never read as a perfect translation score
    avg_l1 = l1_sum / l1_n if l1_n else float("nan")
    avg_ssim = ssim_sum / ssim_n if ssim_n else float("nan")
    if num_classes is None:
        return avg_l1, avg_ssim
    with np.errstate(invalid="ignore"):
        per_class = sums / counts  # nan where the class never appears
    return avg_l1, avg_ssim, per_class
