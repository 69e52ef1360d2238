"""Deterministic PRNG discipline.

Every ``random.*`` / ``np.random`` call site in the reference becomes a keyed
stream here: device-side randomness threads ``jax.random`` keys; host-side
augmentation uses ``numpy.random.Generator`` instances derived from
(seed, epoch, sample index) so any sample's augmentation is reproducible
independent of worker scheduling.
"""

from __future__ import annotations

import numpy as np
import jax


def host_rng(seed: int, *stream: int) -> np.random.Generator:
    """A numpy Generator for a (seed, *stream) tuple, e.g. (seed, epoch, idx)."""
    return np.random.default_rng(np.random.SeedSequence([seed, *stream]))


def split_for_step(key: jax.Array, step) -> jax.Array:
    """Per-step device key: fold the step counter into the base key."""
    return jax.random.fold_in(key, step)
