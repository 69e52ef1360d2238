"""TPU-native framework for RGB->thermal unsupervised domain-adaptation semantic segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``MuliangDu-sudo/thermal-semantic-segmentation`` PyTorch codebase:

- DeepLabV2-ResNet101 segmenter (1- and 3-channel) with ASPP ``Classifier_Module2``
  head (GroupNorm + SE), returning ``{'feat', 'out'}``  [ref: models/deeplabv2.py]
- CycleGAN-style translators (U-Net / ResNet generators, PatchGAN discriminators)
  with differentiable-Canny contour consistency                [ref: models/*]
- Prototype-rectified self-training (pseudo labels, class prototypes, EMA teacher)
                                                  [ref: self_training.py, cal_prototype.py]
- Freiburg Thermal / Cityscapes / KITTI / FLIR data pipelines  [ref: data/*]
- On-device evaluation (confusion-matrix mIoU)                 [ref: utils/eval_tools.py]

Everything under ``jit`` is static-shape, NHWC, bfloat16-friendly, and sharded over a
``jax.sharding.Mesh`` for multi-chip data parallelism (new capability; the reference
is single-device).
"""

__version__ = "0.1.0"

import os as _os

# TSS_PLATFORM=cpu forces the JAX backend for every CLI/script importing this
# package — needed on hosts where a TPU plugin is installed but no device is
# reachable (CI, recipe smokes): plugins may ignore the JAX_PLATFORMS env var
# alone, so set the config flag before any device use.
_platform = _os.environ.get("TSS_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
del _os
