"""Model zoo and checkpoint converters."""

from .deeplab import DeepLabV2, create_deeplab
from .factory import (deeplabv2_resnet101, deeplabv2_resnet101_thermal,
                      init_gan_net, patchgan, resnet_6, resnet_9, unet_32,
                      unet_128, unet_256)
from .torch_convert import (flax_to_torch_state_dict,
                            torch_legacy_state_dict_to_flax,
                            torch_state_dict_to_flax)

__all__ = ["DeepLabV2", "create_deeplab", "deeplabv2_resnet101",
           "deeplabv2_resnet101_thermal", "init_gan_net", "patchgan",
           "resnet_6", "resnet_9", "unet_32", "unet_128", "unet_256",
           "flax_to_torch_state_dict", "torch_legacy_state_dict_to_flax",
           "torch_state_dict_to_flax"]
