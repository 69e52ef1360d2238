"""Segmentation validation — the metric path the build must match.

Equivalent of ``seg_validate`` (segmentation_evaluate.py:24-80): batch
inference, align-corners upsample to (256, 512), argmax, confusion-matrix
accumulation, then (mean_iu, val_loss, cls_iu) with the iu[:11] Freiburg rule.
The confusion matrix and loss sum accumulate on device; one (C, C) + one
scalar transfer happen at the end. Optional palette-PNG prediction dumps match the reference layout
(<save_root>/<i>_prediction.png / _image.png / _groundtruth.png).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..data.palette import colorize_prediction, freiburg_palette
from ..ops.batching import pad_batch_dicts
from ..train.seg import build_seg_eval_step
from .metrics import SegScores, scores_from_hist


def seg_validate(model, variables, loader, *, num_classes: int = 13,
                 ignore_index: int = 12, label_hw=(256, 512),
                 visualize: Optional[str] = None, save_root: Optional[str] = None,
                 iter_counter: int = 0, eval_step=None,
                 pad_to_batch: Optional[int] = None,
                 wire: Optional[str] = "packed", mesh=None,
                 reduce_processes: bool = False):
    """Returns (mean_iu, val_loss, cls_iu) like the reference seg_validate.

    ``visualize``: None | 'save_all' | 'save_one' (reference flag values).
    ``eval_step``: pass a prebuilt jitted step to reuse compilation across calls.
    ``pad_to_batch``: pad partial tail batches to this size with ignore-labeled
    zeros — metric-exact (ignored pixels contribute nothing to the confusion
    matrix or CE) and avoids recompiling for the odd last batch. Lets eval run
    at batch > 1 while matching the reference's batch-1 protocol bit-for-bit.
    ``wire``: host->device feed format (data/wire.py); 'packed' (default)
    double-buffers one compact lossless transfer per batch, None = per-leaf.
    ``mesh``: shard each batch over the mesh's data axis and run the forward
    SPMD — the confusion-matrix/loss reductions cross chips inside the jit
    (the sharded-eval surface __graft_entry__ surface 4 certifies). Requires
    ``pad_to_batch`` divisible by ``mesh.size``; ``variables`` should already
    live on the mesh (replicated) as trainers keep them.
    ``reduce_processes``: set when the caller sharded the DATASET per process
    (DataLoader ``shard=host_shard()``): the per-process confusion matrices /
    loss sums are summed across processes before scoring — exact, because the
    histogram is additive over images. Every process returns the same global
    scores. Leave off when each process evaluates the full set (trainers'
    replicated val loops).
    """
    from ..data.device_pipeline import device_prefetch

    if mesh is not None and (pad_to_batch is None or pad_to_batch % mesh.size):
        raise ValueError(
            f"sharded eval needs pad_to_batch (got {pad_to_batch}) divisible "
            f"by the {mesh.size}-device mesh so tail batches shard too")
    if eval_step is None:
        eval_step = build_seg_eval_step(model, num_classes=num_classes,
                                        ignore_index=ignore_index, label_hw=label_hw)
    hist = jnp.zeros((num_classes, num_classes), jnp.float32)
    loss_sum = jnp.zeros((), jnp.float32)  # accumulated on device
    n_seen = 0
    palette = freiburg_palette()

    padded = pad_batch_dicts(iter(loader), pad_to_batch,
                             {"image": 0.0, "label": ignore_index})
    for i, batch in enumerate(device_prefetch(padded, mesh, wire=wire)):
        image = jnp.asarray(batch["image"])
        label = jnp.asarray(batch["label"])
        real_bs = batch["real_bs"]
        bhist, loss, pred = eval_step(variables, image, label)
        hist = hist + bhist
        loss_sum = loss_sum + loss * real_bs  # no per-batch host sync
        n_seen += real_bs
        if visualize is not None and save_root:
            os.makedirs(save_root, exist_ok=True)
            if visualize == "save_all" or (visualize == "save_one" and i == 0):
                pred0 = np.asarray(pred[0])
                suffix = f"_{iter_counter}" if visualize == "save_one" else ""
                colorize_prediction(pred0, palette).save(
                    os.path.join(save_root, f"{i}_prediction{suffix}.png"))
                colorize_prediction(np.asarray(label[0]), palette).save(
                    os.path.join(save_root, f"{i}_groundtruth.png"))
                img0 = np.asarray(image[0])
                img8 = np.clip(img0 * 255.0, 0, 255).astype(np.uint8)
                from PIL import Image
                Image.fromarray(img8.squeeze(-1) if img8.shape[-1] == 1 else img8).save(
                    os.path.join(save_root, f"{i}_image.png"))

    hist = np.asarray(hist)
    loss_total = float(loss_sum)
    if reduce_processes:
        import jax
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            stats = np.concatenate([hist.ravel(),
                                    [loss_total, float(n_seen)]])
            stats = np.asarray(
                multihost_utils.process_allgather(stats)).sum(axis=0)
            hist = stats[:hist.size].reshape(hist.shape)
            loss_total, n_seen = float(stats[-2]), int(stats[-1])

    scores: SegScores = scores_from_hist(hist)
    val_loss = loss_total / max(n_seen, 1)  # the only scalar transfer
    return scores.mean_iu, val_loss, scores.cls_iu
