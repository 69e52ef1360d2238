"""Byte-bounded decoded-frame cache.

PNG decode dominates the host loader's per-sample cost (measured ~6 ms of a
12 ms Freiburg-IR sample on this host; the zlib inflate is irreducible). The
training recipes iterate the same frames every epoch, so an in-RAM LRU of
decoded (post-resize, post-window) arrays removes decode entirely from epoch
2 onward. The reference has no counterpart (torch DataLoader re-decodes
every epoch).

Disabled by default (``max_bytes = 0``). Enable globally with
``set_decode_cache(mb)`` or per-run with the CLIs' ``--decode_cache_mb``.
Sizing: Freiburg-IR windowed frames are ~0.9 MiB each (700x320 f32), labels
~0.2 MiB; ~12 GiB caches the full ~10k-frame train split — fine on a real
TPU VM host, so is a smaller bound (LRU evicts cold frames).

Thread-safe (the DataLoader decodes from a thread pool). Entries are numpy
arrays; callers re-wrap with ``Image.fromarray`` per use so cached data is
never aliased mutably.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Callable, Hashable

import numpy as np


class DecodeCache:
    def __init__(self, max_bytes: int = 0):
        self.max_bytes = max_bytes
        self._entries: OrderedDict[Hashable, np.ndarray] = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get_or_decode(self, key: Hashable, decode: Callable[[], np.ndarray]
                      ) -> np.ndarray:
        """Return the cached array for ``key``, decoding (outside the lock)
        and inserting on miss. The returned array must be treated read-only."""
        if self.max_bytes <= 0:
            return decode()
        with self._lock:
            arr = self._entries.get(key)
            if arr is not None:
                self._entries.move_to_end(key)
                self.hits += 1
                return arr
            self.misses += 1
        arr = decode()
        nbytes = arr.nbytes
        if nbytes > self.max_bytes:
            return arr  # larger than the whole cache: don't thrash
        with self._lock:
            if key not in self._entries:
                self._entries[key] = arr
                self._bytes += nbytes
                while self._bytes > self.max_bytes:
                    _, old = self._entries.popitem(last=False)
                    self._bytes -= old.nbytes
            return self._entries[key]

    def resize(self, max_bytes: int):
        with self._lock:
            self.max_bytes = max_bytes
            while self._bytes > max(max_bytes, 0) and self._entries:
                _, old = self._entries.popitem(last=False)
                self._bytes -= old.nbytes

    def clear(self):
        with self._lock:
            self._entries.clear()
            self._bytes = 0

    @property
    def nbytes(self) -> int:
        return self._bytes


_GLOBAL = DecodeCache(0)


def set_decode_cache(max_mb: float) -> DecodeCache:
    """Resize the process-global decode cache (0 disables and clears).
    Shrinking evicts immediately so the new bound holds right away."""
    _GLOBAL.resize(int(max_mb * 2**20))
    return _GLOBAL


def decode_cache() -> DecodeCache:
    return _GLOBAL
