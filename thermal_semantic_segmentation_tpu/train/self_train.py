"""Prototype-rectified self-training (reference self_training.py:17-227).

One jitted update fuses everything the reference does per step:
  - source CE (student on translated source)
  - EMA-teacher forward on the full-resolution target image
  - ``full2weak``: mapping teacher features into the student's augmented view.
    The reference loops per sample (resize -> crop -> flip,
    self_training.py:145-158); an align-corners resize followed by a crop/flip
    is a bilinear sample at per-sample affine coordinates, so here it is one
    batched gather (ops.resize.sample_bilinear_at) with static (64, 128) output.
  - prototype-distance softmax weights, soft-label rectification, confidence
    threshold, hard-label override (self_training.py:106-112)
  - pseudo CE + symmetric reverse CE (:114-118)
  - Adam update, EMA weight update (decay 0.999, buffers copied, :128-132)
  - moving prototype update as an in-graph masked-mean + scan fold (:123-126)

Nothing syncs to the host inside the step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import cross_entropy, reverse_cross_entropy
from ..nn.resnet import BN_MOMENTUM
from ..ops.class_means import fold_prototypes, masked_class_means
from ..ops.resize import resize_bilinear, resize_nearest, sample_bilinear_at


class SelfTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_stats: Any
    opt_state: Any
    prototypes: jax.Array          # (num_classes, 256)
    proto_counts: jax.Array        # (num_classes,)
    lr_scale: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def ema_variables(self):
        return {"params": self.ema_params, "batch_stats": self.ema_stats}


def create_self_train_state(model, variables, *, prototypes, learning_rate: float,
                            num_classes: int = 13) -> SelfTrainState:
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return SelfTrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
        ema_params=jax.tree.map(jnp.copy, params),
        ema_stats=jax.tree.map(jnp.copy, stats),
        opt_state=tx.init(params),
        prototypes=jnp.asarray(prototypes, jnp.float32),
        proto_counts=jnp.zeros((num_classes,), jnp.float32),
        lr_scale=jnp.ones((), jnp.float32), tx=tx, apply_fn=model.apply)


def full2weak_coords(weak_params: dict, *, feat_hw: Tuple[int, int],
                     out_hw: Tuple[int, int]):
    """Per-sample fractional source coordinates into the full-res feature map.

    weak_params: {'resized_hw': (B,2) int, 'crop': (B,4) int (y1,y2,x1,x2),
    'flip': (B,) bool} — recorded by data.self_train_aug. All the reference's
    /4 divisions use floor int division (self_training.py:151).
    """
    hf, wf = feat_hw
    oh, ow = out_hw
    h4 = (weak_params["resized_hw"][:, 0] // 4).astype(jnp.float32)
    w4 = (weak_params["resized_hw"][:, 1] // 4).astype(jnp.float32)
    y1_4 = (weak_params["crop"][:, 0] // 4).astype(jnp.float32)
    x1_4 = (weak_params["crop"][:, 2] // 4).astype(jnp.float32)
    # align_corners scale of the (hf, wf) -> (h4, w4) resize
    sr = (hf - 1) / jnp.maximum(h4 - 1.0, 1.0)
    sc = (wf - 1) / jnp.maximum(w4 - 1.0, 1.0)
    rows = (y1_4[:, None] + jnp.arange(oh)[None, :]) * sr[:, None]
    cols = (x1_4[:, None] + jnp.arange(ow)[None, :]) * sc[:, None]
    cols = jnp.where(weak_params["flip"][:, None], cols[:, ::-1], cols)
    return rows, cols


def prototype_weights(feat_weak: jax.Array, prototypes: jax.Array,
                      temperature: float) -> jax.Array:
    """softmax(-(d - d_min) * T) over per-class L2 feature-prototype distances
    (self_training.py:136-143, 160-165). feat_weak: (B, h, w, F) ->
    (B, h, w, C)."""
    f = feat_weak.astype(jnp.float32)
    p = prototypes.astype(jnp.float32)
    # ||f - p||^2 = |f|^2 - 2 f.p + |p|^2 ; the f.p term is an MXU matmul
    f2 = jnp.sum(f * f, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-1)
    fp = jnp.einsum("bhwf,cf->bhwc", f, p, preferred_element_type=jnp.float32)
    dist = jnp.sqrt(jnp.maximum(f2 - 2.0 * fp + p2, 1e-12))
    dist = dist - jnp.min(dist, axis=-1, keepdims=True)
    return jax.nn.softmax(-dist * temperature, axis=-1)


def make_self_train_step(model, *, num_classes: int, ignore_index: int,
                         base_lr: float, proto_temperature: float = 0.5,
                         train_thred: float = 0.0, rce: bool = True,
                         rce_alpha: float = 0.1, rce_beta: float = 1.0,
                         proto_rectify: bool = True, ema: bool = True,
                         moving_prototype: bool = True,
                         proto_momentum: float = 1e-4,
                         ema_decay: float = 0.999,
                         label_hw: Tuple[int, int] = (256, 512),
                         dropout_seed: int = 0,
                         fused_student: bool = True):
    """Build the jitted self-training step.

    step(state, source_image, source_label, target_image, target_image_full,
         target_lp_soft, target_lp_hard, weak_params)
      -> (state, loss_pseudo, loss_source)

    target_lp_soft: (B, C, th, tw) channel-first as saved/augmented, or None
    when proto_rectify=False. target_lp_hard: (B, th, tw) int.

    fused_student=True (default) runs the student's source and target passes
    as ONE vmapped forward over a leading domain axis: the convolutions see
    batch 2B (a batch-B step is overhead-bound on TPU — measured 75 vs 162
    img/s at B=4 vs 8) while BN statistics, dropout masks, and gradients stay
    EXACTLY per-domain (vmap separates them; the same per-domain RNG keys are
    used). The reference's sequential running-stats accumulation
    (self_training.py:51-77: source pass updates, then target pass) is
    reproduced in closed form: with flax's r' = m*r + (1-m)*stat and
    mut_d = m*old + (1-m)*stat_d, two sequential updates equal
    m*mut_src + mut_tgt - m*old.
    """
    scale = 4  # self_training.py:29 scale_rate
    oh, ow = label_hw[0] // scale, label_hw[1] // scale

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: SelfTrainState, source_image, source_label, target_image,
             target_image_full, target_lp_soft, target_lp_hard, weak_params):
        rng = jax.random.fold_in(jax.random.key(dropout_seed), state.step)

        # --- teacher on the full image (no gradient) ---
        full_h, full_w = target_image_full.shape[1:3]
        ema_out = state.apply_fn(state.ema_variables, target_image_full,
                                 train=False)
        ema_feat = resize_bilinear(ema_out["feat"], full_h // 4, full_w // 4)
        ema_logits = resize_bilinear(ema_out["out"], full_h // 4, full_w // 4)
        ema_feat = jax.lax.stop_gradient(ema_feat)
        ema_logits = jax.lax.stop_gradient(ema_logits)

        # --- rectified pseudo labels (no gradient) ---
        if proto_rectify:
            soft = jnp.transpose(target_lp_soft, (0, 2, 3, 1))       # NHWC
            threshold_arg = resize_bilinear(soft, oh, ow)            # (B,oh,ow,C)
            rows, cols = full2weak_coords(
                weak_params, feat_hw=(full_h // 4, full_w // 4), out_hw=(oh, ow))
            feat_weak = sample_bilinear_at(ema_feat, rows, cols)
            weights = prototype_weights(feat_weak, state.prototypes,
                                        proto_temperature)
            hard_lp = resize_nearest(
                target_lp_hard[..., None].astype(jnp.float32), oh, ow
            )[..., 0].astype(jnp.int32)
            rectified = weights * threshold_arg
            pseudo = jnp.argmax(rectified, axis=-1)
            rect_norm = rectified / jnp.maximum(
                jnp.sum(rectified, axis=-1, keepdims=True), 1e-12)
            max_val = jnp.max(rect_norm, axis=-1)
            pseudo = jnp.where(max_val < train_thred, ignore_index, pseudo)
            pseudo = jnp.where(hard_lp != ignore_index, hard_lp, pseudo)
        else:
            hard = resize_bilinear(
                target_lp_hard[..., None].astype(jnp.float32), oh, ow)
            pseudo = hard[..., 0].astype(jnp.int32)
        pseudo = jax.lax.stop_gradient(pseudo)

        # --- student losses ---
        def loss_fn(params):
            if fused_student:
                def fwd(image, key):
                    return state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        image, train=True, mutable=["batch_stats"],
                        rngs={"dropout": key})

                keys = jnp.stack([rng, jax.random.fold_in(rng, 1)])
                outs, muts = jax.vmap(fwd)(
                    jnp.stack([source_image, target_image]), keys)
                src_logits_lr, tgt_logits_lr = outs["out"][0], outs["out"][1]
                # exact sequential fold of the two per-domain stat updates
                m = BN_MOMENTUM
                new_stats = jax.tree.map(
                    lambda old, mut: m * mut[0] + mut[1] - m * old,
                    state.batch_stats, muts["batch_stats"])
            else:
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                src_out, mut = state.apply_fn(
                    variables, source_image, train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                tgt_out, mut2 = state.apply_fn(
                    {"params": params, "batch_stats": mut["batch_stats"]},
                    target_image, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(rng, 1)})
                src_logits_lr, tgt_logits_lr = src_out["out"], tgt_out["out"]
                new_stats = mut2["batch_stats"]

            src_logits = resize_bilinear(src_logits_lr, *label_hw)
            loss_source = cross_entropy(src_logits, source_label,
                                        ignore_index=ignore_index)
            tgt_logits = resize_bilinear(tgt_logits_lr, oh, ow)
            loss_pseudo = cross_entropy(tgt_logits, pseudo,
                                        ignore_index=ignore_index)
            if rce:
                rce_loss = reverse_cross_entropy(tgt_logits, pseudo,
                                                 num_classes=num_classes,
                                                 ignore_index=ignore_index)
                loss_pseudo = rce_alpha * loss_pseudo + rce_beta * rce_loss
            return loss_source + loss_pseudo, (loss_source, loss_pseudo,
                                               new_stats)

        (_, (loss_source, loss_pseudo, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = base_lr * state.lr_scale
        updates, new_opt_state = state.tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # --- moving prototype update from the teacher (self_training.py:123-126)
        prototypes, proto_counts = state.prototypes, state.proto_counts
        if moving_prototype:
            vectors, valid = masked_class_means(
                ema_feat, ema_logits, num_classes=num_classes)
            prototypes, proto_counts = fold_prototypes(
                prototypes, proto_counts, vectors, valid,
                momentum=proto_momentum, mode="moving_average",
                start_mean=False)

        # --- EMA teacher update (self_training.py:128-132) ---
        ema_params, ema_stats = state.ema_params, state.ema_stats
        if ema:
            ema_params = jax.tree.map(
                lambda e, q: e * ema_decay + q * (1.0 - ema_decay),
                ema_params, new_params)
            ema_stats = jax.tree.map(lambda q: q, new_stats)  # buffers copied

        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            ema_params=ema_params, ema_stats=ema_stats,
            opt_state=new_opt_state, prototypes=prototypes,
            proto_counts=proto_counts)
        return new_state, loss_pseudo, loss_source

    return step
