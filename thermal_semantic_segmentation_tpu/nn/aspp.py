"""ASPP heads for DeepLabV2.

``ASPPModule2`` is the active head of the reference (``Classifier_Module2``,
models/deeplabv2.py:141-211): 1x1 + four dilated 3x3 branches -> 256 ch each
with GroupNorm(32) + ReLU, channel concat, SE gate, 3x3 bottleneck conv + GN,
dropout(0.1), 1x1 classifier. Returns both the 256-ch pre-head feature
('feat') and the logits ('out') — the self-training prototype machinery keys
off 'feat'.

``ASPPLegacy`` is the plain sum-of-dilated-convs head used by the legacy
3-channel / thermal models (semantic_segmentation_models.py:69-85).

Note: the reference's ``Classifier_Module`` (models/deeplabv2.py:108-123) has a
loop-return bug that sums only the first two branches; it is dead code and is
deliberately not reproduced.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

GN_EPS = 1e-5


class SEBlock(nn.Module):
    """Squeeze-and-excitation channel gate (models/deeplabv2.py:125-139)."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))                       # (N, C)
        s = nn.Dense(c // self.reduction, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class ASPPModule2(nn.Module):
    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    droprate: float = 0.1
    use_se: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=GN_EPS,
                                       dtype=self.dtype, name=name)
        kaiming = nn.initializers.kaiming_normal()
        branches = [
            nn.relu(gn("branch0_gn")(
                nn.Conv(256, (1, 1), dtype=self.dtype, kernel_init=kaiming,
                        name="branch0_conv")(x)))
        ]
        for i, d in enumerate(self.dilations, start=1):
            y = nn.Conv(256, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d), dtype=self.dtype,
                        kernel_init=kaiming, name=f"branch{i}_conv")(x)
            branches.append(nn.relu(gn(f"branch{i}_gn")(y)))
        y = jnp.concatenate(branches, axis=-1)             # (N,H,W,1280)
        if self.use_se:
            y = SEBlock(dtype=self.dtype, name="se")(y)
        y = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    kernel_init=kaiming, name="bottleneck_conv")(y)
        y = gn("bottleneck_gn")(y)
        # torch Dropout2d zeroes whole channels: broadcast over H, W.
        feat = nn.Dropout(self.droprate, broadcast_dims=(1, 2),
                          deterministic=not train, name="dropout")(y)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.001),
                      name="head_conv")(feat)
        return {"feat": feat, "out": out}


class ASPPLegacy(nn.Module):
    """Sum of four dilated 3x3 convs straight to logits (ASPP_V2)."""

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(self.num_classes, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d), dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f"branch{i}_conv")(x)
            out = y if out is None else out + y
        return out
