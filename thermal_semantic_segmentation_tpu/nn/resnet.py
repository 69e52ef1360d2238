"""Dilated ResNet-101 backbone for DeepLabV2, NHWC flax.linen.

Architecture parity target: ``ResNet101`` in the reference
(models/deeplabv2.py:213-287): 7x7/2 stem, ceil-mode 3x3/2 maxpool, bottleneck
layers [3, 4, 23, 3] with stride 2 only in layer2 and dilations 2/4 in
layers 3/4 (output stride 8), trainable BatchNorm everywhere.

Design notes (TPU-first, not a translation):
- NHWC layout end to end; convs hit the MXU without layout transposes.
- ``dtype`` selects the compute dtype (bfloat16 for training speed); params and
  batch stats stay float32.
- Module/param names mirror the torch state_dict segments so the checkpoint
  converter (models/torch_convert.py) is a pure name map.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pool import max_pool_ceil

# torch BatchNorm2d defaults: momentum=0.1 (flax momentum = 1 - 0.1), eps=1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def conv_init(std: float = 0.01):
    return nn.initializers.normal(stddev=std)


class StemConv(nn.Module):
    """The 7x7/stride-2 stem conv, computed via an exact 2x2 space-to-depth
    reformulation when the input is even-sized.

    The thermal model's 1-channel input uses 1 of 128 MXU lanes (profiled at
    ~0.5% MXU); rewriting the stride-2 7x7 conv as a stride-1 4x4 conv over
    the (N, H/2, W/2, 4C) space-to-depth tensor quadruples lane use and
    quarters the spatial positions while producing bit-identical math in f32
    (tap u of the 7x7 kernel scatters to slot (ka, di) with u + 1 = 2ka + di).
    The parameter keeps the reference (7, 7, C, 64) shape, so torch checkpoint
    conversion and export are unaffected.
    """

    features: int = 64
    dtype: Any = jnp.float32
    s2d: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("kernel", conv_init(), (7, 7, c, self.features),
                       jnp.float32)
        n, h, wd = x.shape[:3]
        if self.s2d and h % 2 == 0 and wd % 2 == 0:
            x2 = x.reshape(n, h // 2, 2, wd // 2, 2, c)
            x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, wd // 2, 4 * c)
            wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))     # (8, 8, C, F)
            w2 = wp.reshape(4, 2, 4, 2, c, self.features)
            w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
            return lax.conv_general_dilated(
                x2.astype(self.dtype), w2.astype(self.dtype), (1, 1),
                ((2, 1), (2, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (2, 2),
            ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    """1x1(s) -> 3x3(dilated) -> 1x1(x4) bottleneck with optional downsample.

    Stride sits on the *first* 1x1 conv, matching the reference's deliberate
    deviation from torchvision (models/deeplabv2.py:66 'change').
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, kernel_init=conv_init(),
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        d = self.dilation
        y = nn.Conv(self.planes, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
                    kernel_init=conv_init(), name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=conv_init(), name="conv3")(y)
        y = bn("bn3")(y)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, kernel_init=conv_init(),
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Stem + 4 bottleneck stages; returns the stride-8, 2048-ch feature map."""

    layers: Sequence[int] = (3, 4, 23, 3)
    num_channels: int = 3
    dtype: Any = jnp.float32
    # Rematerialization of the bottleneck blocks in the backward pass:
    # 'none' saves every autodiff residual; 'dots' saves only conv outputs
    # (jax.checkpoint_policies.dots_saveable — BN/ReLU intermediates are
    # recomputed on the VPU, trading cheap FLOPs for HBM activation traffic);
    # 'full' saves only block boundaries (recomputes convs too — for memory-
    # constrained settings, not speed).
    remat: str = "none"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = StemConv(features=64, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_ceil(x, 3, 2, 1)

        stage_cfg = [  # (planes, stride, dilation)
            (64, 1, 1),
            (128, 2, 1),
            (256, 1, 2),
            (512, 1, 4),
        ]
        if self.remat == "none":
            block_cls = Bottleneck
        elif self.remat == "dots":
            block_cls = nn.remat(
                Bottleneck, static_argnums=(2,),
                policy=jax.checkpoint_policies.dots_saveable)
        elif self.remat == "full":
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))
        else:
            raise ValueError(f"unknown remat mode {self.remat!r}")

        inplanes = 64
        for si, ((planes, stride, dilation), blocks) in enumerate(zip(stage_cfg, self.layers), start=1):
            # downsample on the first block when shape/stride/dilation changes
            # (models/deeplabv2.py:250 includes the dilation==2/4 condition)
            needs_ds = stride != 1 or inplanes != planes * 4 or dilation in (2, 4)
            for bi in range(blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    has_downsample=needs_ds and bi == 0,
                    dtype=self.dtype,
                    name=f"layer{si}_{bi}",
                )(x, train)
            inplanes = planes * 4
        return x
