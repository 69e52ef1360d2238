"""Replay buffer of generated images (utils/misc.py:135-183).

Feeds the discriminator a history of fakes: once full, each incoming image is
returned as-is with p=0.5, or swapped with (and replaced by) a random stored
image with p=0.5.

Two implementations:
- ``ImagePool``: host-side numpy, the reference-faithful parity path. Forces a
  device->host->device roundtrip between the G and D steps (over the axon
  tunnel this serializes every GAN iteration).
- ``DevicePool`` + ``device_pool_query``: the same replay semantics as a jax
  PRNG ring buffer living in HBM, usable INSIDE one fused jitted G+D step —
  no host boundary in the hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class ImagePool:
    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.rng = np.random.default_rng(seed)
        self.num_imgs = 0
        self.images: list[np.ndarray] = []

    def query(self, images) -> np.ndarray:
        """images: (N, H, W, C) batch of fresh fakes -> batch to feed D."""
        images = np.asarray(images)
        if self.pool_size == 0:
            return images
        out = []
        for image in images:
            if self.num_imgs < self.pool_size:
                self.num_imgs += 1
                self.images.append(image.copy())
                out.append(image)
            elif self.rng.uniform() > 0.5:
                rid = int(self.rng.integers(0, self.pool_size))
                out.append(self.images[rid].copy())
                self.images[rid] = image.copy()
            else:
                out.append(image)
        return np.stack(out)


class DevicePool(struct.PyTreeNode):
    """Device-resident ring buffer: (pool_size, H, W, C) + count + PRNG key."""

    buffer: jax.Array
    count: jax.Array
    key: jax.Array


def create_device_pool(pool_size: int, image_shape, *, dtype=jnp.float32,
                       seed: int = 0) -> DevicePool:
    """image_shape: (H, W, C). pool_size=0 makes query a pass-through."""
    return DevicePool(
        buffer=jnp.zeros((max(pool_size, 1), *image_shape), dtype),
        count=jnp.zeros((), jnp.int32),
        key=jax.random.key(seed))


def device_pool_query(pool: DevicePool, images: jax.Array,
                      *, pool_size: int):
    """Batched query with the host pool's sequential per-image semantics
    (fill first, then 50% swap-with-random / 50% pass-through), as a lax.scan.

    Returns (pooled_images, new_pool). Jit-safe; no host syncs.
    """
    if pool_size == 0:
        return images, pool

    def body(carry, img):
        buffer, count, key = carry
        key, k_coin, k_idx = jax.random.split(key, 3)
        not_full = count < pool_size
        swap = jax.random.uniform(k_coin) > 0.5
        rid = jax.random.randint(k_idx, (), 0, pool_size)
        idx = jnp.where(not_full, count, rid)
        stored = jax.lax.dynamic_index_in_dim(buffer, idx, keepdims=False)
        out = jnp.where(~not_full & swap, stored.astype(img.dtype), img)
        write = not_full | swap
        new_val = jnp.where(write, img.astype(buffer.dtype), stored)
        buffer = jax.lax.dynamic_update_index_in_dim(buffer, new_val, idx, 0)
        count = jnp.where(not_full, count + 1, count)
        return (buffer, count, key), out

    (buffer, count, key), outs = jax.lax.scan(
        body, (pool.buffer, pool.count, pool.key), images)
    return outs, DevicePool(buffer=buffer, count=count, key=key)
