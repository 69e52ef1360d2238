"""Normalization-layer factory for the GAN nets (utils/misc.py:80-97).

'batch'    -> BatchNorm, affine, running stats (torch defaults)
'instance' -> InstanceNorm, no affine, no running stats
'none'     -> identity (convs then use bias, like the reference's use_bias rule)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9   # torch momentum 0.1
BN_EPS = 1e-5


def make_norm(norm: str, *, train: bool, dtype: Any = jnp.float32):
    """Returns norm_fn(name) -> layer callable, and use_bias for convs."""
    if norm == "batch":
        def factory(name):
            return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                epsilon=BN_EPS, dtype=dtype, name=name)
        return factory, False
    if norm == "instance":
        def factory(name):
            return nn.GroupNorm(group_size=1, epsilon=BN_EPS, use_scale=False,
                                use_bias=False, dtype=dtype, name=name)
        return factory, True
    if norm == "none":
        def factory(name):
            return lambda x: x
        return factory, True
    raise NotImplementedError(f"normalization layer [{norm}] is not found")
