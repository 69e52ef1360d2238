"""70x70 PatchGAN discriminator (models/discriminators.py:12-55), NHWC."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .norms import make_norm

_GAIN_INIT = nn.initializers.normal(stddev=0.02)


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm_fn, use_bias = make_norm(self.norm, train=train, dtype=self.dtype)
        x = x.astype(self.dtype)
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    kernel_init=_GAIN_INIT, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=use_bias,
                        kernel_init=_GAIN_INIT, name=f"conv{n}")(h)
            h = nn.leaky_relu(norm_fn(f"norm{n}")(h), 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=use_bias,
                    kernel_init=_GAIN_INIT, name=f"conv{self.n_layers}")(h)
        h = nn.leaky_relu(norm_fn(f"norm{self.n_layers}")(h), 0.2)
        # 1-channel patch map, no sigmoid (LSGAN expects raw scores)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=[(1, 1), (1, 1)],
                       kernel_init=_GAIN_INIT, name="head")(h)
