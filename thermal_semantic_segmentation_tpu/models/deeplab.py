"""DeepLabV2-ResNet101 segmenter — the framework's flagship model.

One parameterized model covers the reference's three DeepLab variants
(SURVEY.md C13/C14a/C14b): ``num_channels`` 1 or 3 selects thermal vs RGB
input, ``head='module2'`` is the active GroupNorm+SE ASPP head returning
``{'feat','out'}`` (models/deeplabv2.py:356-378), ``head='legacy'`` is the
plain ASPP_V2 sum head of the legacy models
(semantic_segmentation_models.py:182, thermal_semantic_segmentation_models.py:186).

Outputs are stride-8 logits; callers upsample with
``ops.resize.upsample_logits`` exactly like the reference does at its loss and
eval sites.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.aspp import ASPPLegacy, ASPPModule2
from ..nn.resnet import BN_EPS, BN_MOMENTUM, ResNetBackbone


class DeepLabV2(nn.Module):
    num_classes: int = 13
    num_channels: int = 3
    head: str = "module2"           # 'module2' | 'legacy'
    bn_clr: bool = False            # extra BN on the 2048-ch feature (bn_clr flag)
    layers: tuple = (3, 4, 23, 3)   # ResNet-101 by default; override for tests
    dtype: Any = jnp.float32
    remat: str = "none"             # backbone remat: 'none' | 'dots' | 'full'

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (N, H, W, num_channels) -> {'feat': (N,H/8,W/8,256), 'out': (N,H/8,W/8,C)}"""
        x = x.astype(self.dtype)
        feat = ResNetBackbone(layers=self.layers, num_channels=self.num_channels,
                              dtype=self.dtype, remat=self.remat,
                              name="backbone")(x, train=train)
        if self.bn_clr:
            feat = nn.BatchNorm(use_running_average=not train,
                                momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=self.dtype, name="bn_pretrain")(feat)
        if self.head == "module2":
            out = ASPPModule2(num_classes=self.num_classes, dtype=self.dtype,
                              name="layer5")(feat, train=train)
        elif self.head == "legacy":
            logits = ASPPLegacy(num_classes=self.num_classes, dtype=self.dtype,
                                name="layer5")(feat)
            out = {"feat": feat, "out": logits}
        else:
            raise ValueError(f"unknown head {self.head!r}")
        return out


def bn_param_mask(params, batch_stats):
    """Pytree mask (over params) selecting every BatchNorm scale/bias.

    BN modules are identified exactly: they are the only modules owning a
    ``batch_stats`` subtree, so a param leaf is a BN affine param iff its
    parent module path appears in batch_stats. (Robust to naming — GroupNorms
    in the ASPP head have scale/bias too but no batch stats.)
    """
    bn_paths = set()

    def record(path, _):
        bn_paths.add(tuple(k.key for k in path[:-1]))
    jax.tree_util.tree_map_with_path(record, batch_stats)
    return jax.tree_util.tree_map_with_path(
        lambda p, _: tuple(k.key for k in p[:-1]) in bn_paths, params)


def freeze_bn_params(params, batch_stats):
    """stop_gradient every BN scale/bias.

    Reference semantics (models/deeplabv2.py:349-360 ``freeze_bn_func``): sets
    ``requires_grad=False`` on BN weight/bias ONLY — it does NOT call
    ``m.eval()``, so running stats keep updating in train mode and
    normalization still uses batch statistics. This transform reproduces that
    exactly: zero grads for BN affine params (Adam/SGD updates stay
    identically zero), batch_stats mutation untouched.
    """
    mask = bn_param_mask(params, batch_stats)
    return jax.tree.map(
        lambda p, m: jax.lax.stop_gradient(p) if m else p, params, mask)


class FrozenBNModel:
    """Wraps a flax model so ``apply`` stop-gradients BN scale/bias.

    Delegates everything else to the wrapped module, so trainers that take
    ``model.apply`` / ``model.init`` work unchanged.
    """

    def __init__(self, model):
        self._model = model

    def __getattr__(self, name):
        return getattr(self._model, name)

    def apply(self, variables, *args, **kwargs):
        stats = variables.get("batch_stats", {})
        params = freeze_bn_params(variables["params"], stats)
        return self._model.apply({**variables, "params": params},
                                 *args, **kwargs)


def create_deeplab(rng: jax.Array, *, num_classes: int = 13, num_channels: int = 1,
                   head: str = "module2", bn_clr: bool = False,
                   layers=(3, 4, 23, 3), dtype: Any = jnp.float32,
                   image_size=(256, 512), abstract: bool = False,
                   remat: str = "none", freeze_bn: bool = False):
    """Build the model and initialize variables.

    Returns (model, variables) where variables = {'params', 'batch_stats'}.

    init is jitted: un-jitted flax init dispatches each of the ~350 ops as its
    own XLA computation, which is minutes of round-trips on a tunneled TPU.
    ``abstract=True`` skips device work entirely (jax.eval_shape) — use it when
    a checkpoint will overwrite the variables.

    ``freeze_bn=True`` mirrors the reference factory arg
    (models/deeplabv2.py:356 ``Deeplab(..., freeze_bn=...)``): BN scale/bias
    receive zero gradients (see freeze_bn_params for the exact semantics —
    running stats still update, as in the reference). No reference entry point
    passes True; exposed for factory-surface parity.
    """
    model = DeepLabV2(num_classes=num_classes, num_channels=num_channels,
                      head=head, bn_clr=bn_clr, layers=tuple(layers),
                      dtype=dtype, remat=remat)
    dummy = jax.ShapeDtypeStruct((1, *image_size, num_channels), jnp.float32)
    init = lambda r, x: model.init({"params": r}, x, train=False)
    if abstract:
        variables = jax.eval_shape(init, rng, dummy)
    else:
        variables = jax.jit(init)(rng, jnp.zeros(dummy.shape, dummy.dtype))
    if freeze_bn:
        model = FrozenBNModel(model)
    return model, variables


def backbone_and_head_masks(params):
    """Pytree masks selecting backbone (1x LR) vs head (10x LR) parameters.

    Mirrors the reference's optim_parameters split (models/deeplabv2.py:289-321):
    conv1/bn1/layer1-4 at base LR, layer5 (+bn_pretrain) at 10x.
    """
    def is_head(path):
        top = path[0]
        return top in ("layer5", "bn_pretrain")

    def mask(pred):
        def build(path_pred):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: path_pred(tuple(k.key for k in p)), params)
        return build(pred)

    head_mask = mask(is_head)
    backbone_mask = jax.tree.map(lambda b: not b, head_mask)
    return backbone_mask, head_mask
