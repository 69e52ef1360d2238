"""CycleGAN generator zoo: U-Net (5/7/8 downs) and ResNet (6/9 blocks), NHWC.

Behavioral spec: models/generators.py. The reference builds the U-Net as a
recursive module chain (UnetSkipConnectionBlock, :168-235); here the identical
dataflow is written as an explicit encoder/decoder loop with skip concats —
same convs, same channel schedule, XLA-friendly static structure.

ConvTranspose k4/s2/p1 doubles spatial dims exactly like torch
(out = (H-1)*2 - 2 + 4 = 2H) via explicit ((1,1),(1,1)) padding.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norms import make_norm

def weight_init(init_type: str = "normal", init_gain: float = 0.02):
    """GAN weight initializers matching utils/misc.py:100-132:
    normal | xavier | kaiming | orthogonal."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=init_gain)
    if init_type == "xavier":
        return nn.initializers.xavier_normal()
    if init_type == "kaiming":
        return nn.initializers.kaiming_normal()
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=init_gain)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented")


_GAIN_INIT = weight_init("normal", 0.02)


def _conv(features, k, s, pad, use_bias, name, init=None):
    return nn.Conv(features, (k, k), strides=(s, s), padding=[(pad, pad)] * 2,
                   use_bias=use_bias, kernel_init=init or _GAIN_INIT, name=name)


def _convT(features, use_bias, name, k=4, init=None, phased=False):
    # Explicit padding matching torch ConvTranspose2d(k=4,s=2,p=1) and
    # (k=3,s=2,p=1,output_padding=1): lax.conv_transpose pad per edge is
    # (k-1-p, k-1-p+output_padding). Both give exactly 2H, with the same
    # left/right placement as torch, so converted checkpoints are bit-aligned.
    if phased and k == 4:
        return PhasedConvTranspose(features, use_bias=use_bias,
                                   kernel_init=init or _GAIN_INIT, name=name)
    pad = (k - 2, k - 2 + (k % 2))
    return nn.ConvTranspose(features, (k, k), strides=(2, 2), padding=[pad, pad],
                            use_bias=use_bias, kernel_init=init or _GAIN_INIT,
                            name=name)


class PhasedConvTranspose(nn.Module):
    """ConvTranspose(k=4, s=2, p=1) as ONE dense stride-1 2x2 conv + a
    depth-to-space interleave — mathematically identical to the input-dilated
    formulation (parity-tested), but MXU-dense: no lhs_dilation zero-stuffing
    and none of the layout copies XLA emits around dilated convs (profiled at
    26% of the fused GAN step, "data formatting" — see CLAUDE.md).

    The output at (2m+ph, 2n+pw) touches exactly the taps of W with row
    parity ph and column parity pw: out[2m] = x[m-1] W[0] + x[m] W[2],
    out[2m+1] = x[m] W[1] + x[m+1] W[3] (per axis). So one VALID 2x2 conv on
    the 1-padded input with 4F output channels computes all four phases;
    shifted slices + a reshape interleave them.

    The parameter is the SAME (4, 4, C, F) kernel (+ (F,) bias) that
    nn.ConvTranspose stores, so checkpoints/converters are unaffected.
    """

    features: int
    use_bias: bool = True
    kernel_init: Any = _GAIN_INIT

    @nn.compact
    def __call__(self, x):
        c, f = x.shape[-1], self.features
        kernel = self.param("kernel", self.kernel_init, (4, 4, c, f))
        kernel = kernel.astype(x.dtype)
        taps = {0: (0, 2), 1: (1, 3)}
        blocks = [kernel[taps[ph], :, :, :][:, taps[pw], :, :]
                  for ph in (0, 1) for pw in (0, 1)]      # 4 x (2,2,C,F)
        k2 = jnp.concatenate(blocks, axis=-1)             # (2,2,C,4F)
        n, h, w = x.shape[:3]
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xpad, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (N,H+1,W+1,4F)
        phases = jnp.stack([y[:, ph:ph + h, pw:pw + w, i * f:(i + 1) * f]
                            for i, (ph, pw) in enumerate(
                                [(0, 0), (0, 1), (1, 0), (1, 1)])], axis=-2)
        out = (phases.reshape(n, h, w, 2, 2, f)
               .transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, f))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (f,)).astype(x.dtype)
        return out


class UnetGenerator(nn.Module):
    """U-Net with ``num_downs`` stride-2 stages; input must be divisible by
    2**num_downs (unet_256 -> 8 downs on 256x*, models/generators.py:136-165)."""

    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Any = jnp.float32
    # up-conv formulation: 'dilated' (nn.ConvTranspose / lhs_dilation) or
    # 'phased' (PhasedConvTranspose: dense 2x2 conv + depth-to-space; exact
    # same math and param layout, fewer TPU layout copies)
    convt: str = "dilated"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm_fn, use_bias = make_norm(self.norm, train=train, dtype=self.dtype)
        init = weight_init(self.init_type, self.init_gain)
        phased = self.convt == "phased"
        g = self.ngf
        filters = [g, 2 * g, 4 * g] + [8 * g] * (self.num_downs - 3)
        x = x.astype(self.dtype)

        # encoder; ys[d] is the input to decoder stage d's skip concat
        ys = []
        # outermost: conv only; bias follows the norm rule like every other
        # downconv (models/generators.py:196-197 passes bias=use_bias here too)
        h = _conv(filters[0], 4, 2, 1, use_bias, "down0", init)(x)
        ys.append(h)
        for d in range(1, self.num_downs):
            h = nn.leaky_relu(h, 0.2)
            h = _conv(filters[d], 4, 2, 1, use_bias, f"down{d}", init)(h)
            if d < self.num_downs - 1:                      # innermost has no norm
                h = norm_fn(f"down{d}_norm")(h)
                ys.append(h)

        # decoder with skip concats (reverse order)
        for d in range(self.num_downs - 1, 0, -1):
            h = nn.relu(h)
            h = _convT(filters[d - 1], use_bias, f"up{d}", init=init,
                       phased=phased)(h)
            h = norm_fn(f"up{d}_norm")(h)
            if self.use_dropout and d > 3 and d < self.num_downs - 1:
                h = nn.Dropout(0.5, deterministic=not train, name=f"up{d}_drop")(h)
            h = jnp.concatenate([ys[d - 1], h], axis=-1)
        h = nn.relu(h)
        h = _convT(self.output_nc, True, "up0", init=init, phased=phased)(h)
        return jnp.tanh(h)


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "batch"
    use_dropout: bool = False
    use_bias: bool = False
    padding_type: str = "reflect"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm_fn, _ = make_norm(self.norm, train=train, dtype=self.dtype)

        def pad(h):
            if self.padding_type in ("reflect", "replicate"):
                mode = "reflect" if self.padding_type == "reflect" else "edge"
                return jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
            return h

        p = 1 if self.padding_type == "zero" else 0
        y = _conv(self.dim, 3, 1, p, self.use_bias, "conv1")(pad(x))
        y = nn.relu(norm_fn("norm1")(y))
        if self.use_dropout:
            y = nn.Dropout(0.5, deterministic=not train, name="drop")(y)
        y = _conv(self.dim, 3, 1, p, self.use_bias, "conv2")(pad(y))
        y = norm_fn("norm2")(y)
        return x + y


class ResnetGenerator(nn.Module):
    """Reflection-padded 7x7 stem, 2 downs, n ResNet blocks, 2 ups
    (models/generators.py:74-133)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "batch"
    use_dropout: bool = False
    padding_type: str = "reflect"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm_fn, use_bias = make_norm(self.norm, train=train, dtype=self.dtype)
        init = weight_init(self.init_type, self.init_gain)
        x = x.astype(self.dtype)
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = _conv(self.ngf, 7, 1, 0, use_bias, "stem", init)(h)
        h = nn.relu(norm_fn("stem_norm")(h))
        for i in range(2):
            mult = 2 ** i
            h = _conv(self.ngf * mult * 2, 3, 2, 1, use_bias, f"down{i}")(h)
            h = nn.relu(norm_fn(f"down{i}_norm")(h))
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, norm=self.norm, use_dropout=self.use_dropout,
                            use_bias=use_bias, padding_type=self.padding_type,
                            dtype=self.dtype, name=f"block{i}")(h, train=train)
        for i in range(2):
            mult = 2 ** (2 - i)
            h = _convT(int(self.ngf * mult / 2), use_bias, f"up{i}", k=3)(h)
            h = nn.relu(norm_fn(f"up{i}_norm")(h))
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = _conv(self.output_nc, 7, 1, 0, True, "head")(h)
        return jnp.tanh(h)
