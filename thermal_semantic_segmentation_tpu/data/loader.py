"""Batched, prefetching data loader.

Replaces ``torch.utils.data.DataLoader(num_workers=2, pin_memory=True)`` with a
thread-pool loader: per-sample deterministic RNG (seed, epoch, index), numpy
collation, optional subset sampling (the reference's SubsetRandomSampler
80/20 split, segmentation_train.py:129-139), and pipelined batch prefetch so
host decode overlaps device compute.
"""

from __future__ import annotations

import concurrent.futures as cf
import logging
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from ..core.prng import host_rng


def default_collate(samples: Sequence[dict]) -> dict:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], dict):  # e.g. weak_params
            out[key] = default_collate(vals)
        elif isinstance(vals[0], (str, bytes)):
            out[key] = list(vals)
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


def split_indices(n: int, validation_split: float = 0.2, seed: int = 42):
    """The reference's 80/20 split: np.random.seed(42) shuffle then slice
    (segmentation_train.py:129-135). Returns (train_indices, val_indices)."""
    indices = np.arange(n)
    rs = np.random.RandomState(seed)
    rs.shuffle(indices)
    split = int(np.floor(validation_split * n))
    return indices[split:].tolist(), indices[:split].tolist()


class DataLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 indices: Optional[Sequence[int]] = None, drop_last: bool = True,
                 seed: int = 0, num_threads: int = 8,
                 collate: Callable = default_collate, prefetch: int = 2,
                 corrupt_retries: int = 4,
                 shard: Optional[tuple] = None,
                 shard_lockstep: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.indices = list(indices) if indices is not None else list(range(len(dataset)))
        self.drop_last = drop_last
        # (shard_id, num_shards): multi-host data parallelism — each process
        # iterates a disjoint strided slice of the (shuffled) epoch order,
        # truncated so every host sees the SAME number of batches per epoch
        # (hosts must stay in lockstep or the mesh collectives desync).
        # The reference is single-process (no counterpart).
        # shard_lockstep=False drops the truncation: the slices still
        # partition the dataset exactly, but hosts may see different batch
        # counts — for offline file-writing CLIs (pseudo-gen, translator)
        # where EVERY sample must be processed and no collectives cross
        # hosts (each process runs its own local mesh).
        self.shard = tuple(shard) if shard else None
        self.shard_lockstep = shard_lockstep
        if self.shard is not None:
            sid, n = self.shard
            assert 0 <= sid < n, self.shard
        self.seed = seed
        self.num_threads = num_threads
        self.collate = collate
        self.prefetch = prefetch
        # Unreadable samples (beyond what PIL's LOAD_TRUNCATED_IMAGES absorbs,
        # data/__init__.py) are replaced by a deterministic substitute instead
        # of aborting the epoch; 0 disables and re-raises.
        self.corrupt_retries = corrupt_retries
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.shard is not None:
            sid, nsh = self.shard
            n = n // nsh if self.shard_lockstep else -(-(n - sid) // nsh)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self):
        order = list(self.indices)
        if self.shuffle:
            host_rng(self.seed, self.epoch).shuffle(order)
        if self.shard is not None:
            sid, nsh = self.shard
            order = order[sid::nsh]
            if self.shard_lockstep:
                # equalize: lockstep across hosts (training collectives)
                order = order[:len(self.indices) // nsh]
        bs = self.batch_size
        limit = len(order) - (len(order) % bs) if self.drop_last else len(order)
        for start in range(0, limit, bs):
            yield order[start:start + bs]

    def __iter__(self) -> Iterator[dict]:
        epoch = self.epoch
        self.epoch += 1

        def fetch(idx: int) -> dict:
            for attempt in range(self.corrupt_retries + 1):
                # deterministic substitute chain: same (seed, epoch, idx)
                # always yields the same replacement sample
                use = idx if attempt == 0 else self.indices[
                    (idx * 1009 + attempt * 9176) % len(self.indices)]
                try:
                    return self.dataset.get(use, host_rng(self.seed, epoch, use))
                except Exception:
                    if attempt == self.corrupt_retries:
                        raise
                    logging.getLogger(__name__).warning(
                        "failed to load sample %d (attempt %d); substituting",
                        use, attempt + 1, exc_info=True)

        def fetch_batch(batch_idx):
            """Whole-batch fast path (e.g. the native C++ batch decoder);
            None or an error falls back to the per-sample path, which carries
            the corrupt-image substitution logic."""
            try:
                rngs = [host_rng(self.seed, epoch, i) for i in batch_idx]
                samples = self.dataset.get_batch(batch_idx, rngs)
            except Exception:
                logging.getLogger(__name__).warning(
                    "get_batch failed; falling back to per-sample loads",
                    exc_info=True)
                samples = None
            return samples if samples is not None else [fetch(i) for i in batch_idx]

        # opt-in only: the fallback inside fetch_batch loads per-sample
        # serially, so don't route through it unless the dataset asked for
        # batch decoding (keeps full thread-pool parallelism for PIL loads)
        use_batch = (hasattr(self.dataset, "get_batch")
                     and getattr(self.dataset, "native_decode", False))
        with cf.ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            pending = []
            batch_iter = self._batches()

            def submit_next():
                try:
                    batch_idx = next(batch_iter)
                except StopIteration:
                    return False
                if use_batch:
                    pending.append(pool.submit(fetch_batch, batch_idx))
                else:
                    pending.append([pool.submit(fetch, i) for i in batch_idx])
                return True

            for _ in range(self.prefetch + 1):
                if not submit_next():
                    break
            while pending:
                item = pending.pop(0)
                samples = (item.result() if isinstance(item, cf.Future)
                           else [f.result() for f in item])
                submit_next()
                yield self.collate(samples)
