"""Translation-quality evaluation: L1 + SSIM between originals and their
translations over the seed-42 20% split (reference distance_evaluate.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ssim import ssim
from ..utils.meters import AverageMeter


@jax.jit
def _pair_metrics(ori, trans):
    l1 = jnp.mean(jnp.abs(ori.astype(jnp.float32) - trans.astype(jnp.float32)))
    return l1, ssim(ori, trans, data_range=1.0)


def evaluate_distance(loader, *, wire: str | None = "packed"):
    """Returns (avg_l1, avg_ssim) over the loader."""
    from ..data.device_pipeline import device_prefetch

    distances = AverageMeter("distance", ":3.4f")
    ssim_scores = []
    for batch in device_prefetch(iter(loader), wire=wire):
        ori = jnp.asarray(batch["original"])
        trans = jnp.asarray(batch["translated"])
        l1, s = _pair_metrics(ori, trans)
        distances.update(float(l1), ori.shape[0])
        ssim_scores.append(float(s))
    return distances.avg, float(np.mean(ssim_scores)) if ssim_scores else float("nan")
