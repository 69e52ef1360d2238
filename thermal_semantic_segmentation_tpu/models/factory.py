"""Model factories mirroring the reference constructors.

Generators (models/generators.py:238-345), discriminator
(models/discriminators.py:12), DeepLab variants (models/deeplabv2.py:356,
semantic_segmentation_models.py:182, thermal_semantic_segmentation_models.py:186).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..nn.generators import ResnetGenerator, UnetGenerator
from ..nn.patchgan import NLayerDiscriminator
from .deeplab import DeepLabV2


def unet_256(ngf: int = 64, input_nc: int = 3, output_nc: int = 3,
             norm: str = "batch", use_dropout: bool = False,
             init_type: str = "normal", init_gain: float = 0.02,
             dtype: Any = jnp.float32, convt: str = "dilated"):
    del input_nc  # input channels are inferred from data at init time
    return UnetGenerator(output_nc=output_nc, num_downs=8, ngf=ngf, norm=norm,
                         use_dropout=use_dropout, init_type=init_type,
                         init_gain=init_gain, dtype=dtype, convt=convt)


def unet_128(ngf: int = 64, input_nc: int = 3, output_nc: int = 3,
             norm: str = "batch", use_dropout: bool = False,
             init_type: str = "normal", init_gain: float = 0.02,
             dtype: Any = jnp.float32, convt: str = "dilated"):
    del input_nc
    return UnetGenerator(output_nc=output_nc, num_downs=7, ngf=ngf, norm=norm,
                         use_dropout=use_dropout, init_type=init_type,
                         init_gain=init_gain, dtype=dtype, convt=convt)


def unet_32(ngf: int = 64, input_nc: int = 3, output_nc: int = 3,
            norm: str = "batch", use_dropout: bool = False,
            init_type: str = "normal", init_gain: float = 0.02,
            dtype: Any = jnp.float32, convt: str = "dilated"):
    del input_nc
    return UnetGenerator(output_nc=output_nc, num_downs=5, ngf=ngf, norm=norm,
                         use_dropout=use_dropout, init_type=init_type,
                         init_gain=init_gain, dtype=dtype, convt=convt)


def resnet_9(ngf: int = 64, input_nc: int = 3, output_nc: int = 3,
             norm: str = "batch", use_dropout: bool = False,
             init_type: str = "normal", init_gain: float = 0.02,
             dtype: Any = jnp.float32):
    del input_nc
    return ResnetGenerator(output_nc=output_nc, ngf=ngf, n_blocks=9, norm=norm,
                           use_dropout=use_dropout, init_type=init_type,
                           init_gain=init_gain, dtype=dtype)


def resnet_6(ngf: int = 64, input_nc: int = 3, output_nc: int = 3,
             norm: str = "batch", use_dropout: bool = False,
             init_type: str = "normal", init_gain: float = 0.02,
             dtype: Any = jnp.float32):
    del input_nc
    return ResnetGenerator(output_nc=output_nc, ngf=ngf, n_blocks=6, norm=norm,
                           use_dropout=use_dropout, init_type=init_type,
                           init_gain=init_gain, dtype=dtype)


def patchgan(ndf: int = 64, input_nc: int = 1, n_layers: int = 3,
             norm: str = "batch", dtype: Any = jnp.float32):
    del input_nc
    return NLayerDiscriminator(ndf=ndf, n_layers=n_layers, norm=norm, dtype=dtype)


def deeplabv2_resnet101(num_classes: int = 19, dtype: Any = jnp.float32):
    """Legacy 3-channel DeepLabV2 with the plain ASPP_V2 sum head
    (semantic_segmentation_models.py:182-200). Used frozen for the GAN's
    semantic-consistency loss; expects BGR mean-subtracted input."""
    return DeepLabV2(num_classes=num_classes, num_channels=3, head="legacy",
                     dtype=dtype)


def deeplabv2_resnet101_thermal(num_classes: int = 19, dtype: Any = jnp.float32):
    """Legacy 1-channel thermal DeepLabV2
    (thermal_semantic_segmentation_models.py:186-204)."""
    return DeepLabV2(num_classes=num_classes, num_channels=1, head="legacy",
                     dtype=dtype)


def init_gan_net(model, rng: jax.Array, input_shape, *, train_shape_check=True):
    """Jitted init for generator/discriminator nets. Returns variables."""
    dummy = jnp.zeros(input_shape, jnp.float32)
    return jax.jit(lambda r, x: model.init({"params": r}, x, train=False))(rng, dummy)
