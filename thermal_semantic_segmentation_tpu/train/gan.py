"""GAN translation training (CycleGAN and one-direction variants).

Re-design of the reference trainers (train.py:87-262, train_gan.py:87-186).
Two trainer shapes share the same update cores:

- ``make_fused_gan_step``: G update + device-resident ImagePool + D update in
  ONE jitted step — no host boundary in the hot loop (the default).
- ``make_gan_steps``: two jitted steps with the host ImagePool in between
  (reference-faithful loop shape; parity/debug path):

  g_step: all generator forwards (fake/rec), GAN + cycle + contour + semantic
          losses, one Adam update over the chained generator params — D params
          are read-only inside (the functional equivalent of
          set_requires_grad(d, False), train.py:153-154).
  d_step: PatchGAN real/fake losses on pool-mixed fakes, one Adam update over
          the chained discriminator params.

Quirk notes vs the reference:
- train.py:186-189 ``.detach()``es BOTH sides of the contour loss, making it a
  constant; here the gradient flows through the generated image (the real-image
  side stays stopped). Set ``contour_detached=True`` for bug-compatible no-op.
- train.py:201 uses an undefined ``label_s`` (crashes upstream); the semantic
  loss here implements the working train_gan.py:126 semantics.
- D's BatchNorm running stats update only in d_step (the reference lets G's
  forward through D mutate them as a side effect).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import GAN_LOSSES, l1_loss, semantic_consistency
from ..nn.canny import canny_edges
from ..nn.resnet import BN_MOMENTUM
from ..ops.resize import upsample_logits


def _fold_sequential_stats(old, mut_first, mut_second, m: float = BN_MOMENTUM):
    """Closed form of two sequential flax running-stat updates.

    Each pass computes mut_i = m*old + (1-m)*stat_i when run against the same
    ``old`` stats; applying them in order gives m*(m*old + (1-m)*stat_1)
    + (1-m)*stat_2 = m*mut_first + mut_second - m*old. Running stats never
    feed train-mode normalization, so re-basing both passes on ``old`` and
    folding is EXACTLY the reference's sequential threading.
    """
    return jax.tree.map(lambda o, a, b: m * a + b - m * o,
                        old, mut_first, mut_second)


class GanTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Dict[str, Any]
    g_stats: Dict[str, Any]
    d_params: Dict[str, Any]
    d_stats: Dict[str, Any]
    opt_g: Any
    opt_d: Any
    tx_g: optax.GradientTransformation = struct.field(pytree_node=False)
    tx_d: optax.GradientTransformation = struct.field(pytree_node=False)


def create_gan_state(*, g_vars: Dict[str, Any], d_vars: Dict[str, Any],
                     learning_rate: float) -> GanTrainState:
    """g_vars/d_vars: name -> flax variables ({'params', 'batch_stats'?})."""
    g_params = {k: v["params"] for k, v in g_vars.items()}
    g_stats = {k: v.get("batch_stats", {}) for k, v in g_vars.items()}
    d_params = {k: v["params"] for k, v in d_vars.items()}
    d_stats = {k: v.get("batch_stats", {}) for k, v in d_vars.items()}
    tx_g = optax.adam(learning_rate)
    tx_d = optax.adam(learning_rate)
    return GanTrainState(step=jnp.zeros((), jnp.int32),
                         g_params=g_params, g_stats=g_stats,
                         d_params=d_params, d_stats=d_stats,
                         opt_g=tx_g.init(g_params), opt_d=tx_d.init(d_params),
                         tx_g=tx_g, tx_d=tx_d)


def _gray(x: jax.Array) -> jax.Array:
    """torchvision Grayscale luminance weights on NHWC RGB."""
    if x.shape[-1] == 1:
        return x
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.tensordot(x, w, axes=[[-1], [0]])[..., None]


def gan_to_seg_tensor(x: jax.Array, domain: str,
                      mode: str = "legacy") -> jax.Array:
    """tensor_transmit (train.py:60-75): de-normalize a GAN tensor
    (mean=std=0.5) for the frozen sem nets.

    mode='legacy' re-normalizes for the reference's zoo-pretrained legacy
    DeepLabs ([0,255], BGR + mean subtract for source RGB, mean subtract
    for target thermal). mode='module2' re-normalizes for this repo's own
    seg-trainer checkpoints, which consume the data pipeline's [0,1] scale
    (RGB ToArray / IR radiometric window, data/freiburg.py:44-45)."""
    if domain not in ("source", "target"):
        raise ValueError(domain)
    if mode == "module2":
        return x * 0.5 + 0.5
    x = (x * 0.5 + 0.5) * 255.0
    if domain == "source":
        x = x[..., ::-1] - jnp.asarray([104.00698793, 116.66876762, 122.67891434])
    else:
        x = x - jnp.asarray([116.66876762])
    return x


def _make_gan_cores(*, g_apply: Dict[str, Callable], d_apply: Dict[str, Callable],
                    cycle: bool = True, gan_loss: str = "lsgan",
                    cycle_weight: float = 10.0,
                    with_contour: bool = False, grayscale_source: bool = False,
                    canny_rgb_threshold: float = 2.5,
                    canny_thermal_threshold: float = 1.0,
                    contour_detached: bool = False,
                    sem_apply: Optional[Dict[str, Callable]] = None,
                    sem_ignore_classes: Tuple[int, ...] = (),
                    sem_norm: str = "legacy",
                    fused_passes: bool = True):
    """Unjitted (g_core, d_core) update functions shared by the two-step and
    fused GAN trainers.

    g_apply: {'s2t': apply_fn, 't2s': apply_fn?}; d_apply: {'t': ..., 's': ...?}
    sem_apply: {'s': apply_fn, 't': apply_fn} frozen legacy seg nets (optional).

    fused_passes=True (default) merges same-net same-shape passes into one
    vmapped pass over a leading domain axis — batch-4 passes are
    latency-bound on TPU (see train/self_train.py fused_student). In the
    cycle trainer the two s2t forwards (real_s -> fake_t, fake_s -> rec_t)
    become one 2B pass after reordering around the t2s(real_t) dependency;
    in d_core each discriminator's real/fake passes merge. BN statistics,
    gradients, and the reference's sequential running-stat accumulation order
    (train.py:146-149 for G, :213-218 for D) are preserved exactly
    (_fold_sequential_stats).
    """
    adv = GAN_LOSSES[gan_loss]

    def apply_net(apply_fn, params, stats, x, want_stats):
        out, mut = apply_fn({"params": params, "batch_stats": stats}, x,
                            train=True, mutable=["batch_stats"])
        return (out, mut["batch_stats"]) if want_stats else (out, stats)

    def g_core(state: GanTrainState, real_s, real_t, label_s=None,
               sem_vars=None, *, with_sem: bool = False):
        def loss_fn(g_params):
            metrics = {}
            new_stats = {}
            outs = {}
            if cycle and fused_passes:
                # reorder around the data dependency: t2s(real_t) first, then
                # ONE vmapped 2B s2t pass over [real_s, fake_s], then
                # t2s(fake_t). Per-slice BN stats under vmap = the reference's
                # per-pass stats; running stats folded in reference pass order
                # (s2t: real_s then fake_s; t2s: fake_t then real_t,
                # train.py:146-149).
                fake_s, mut_t2s_real_t = apply_net(
                    g_apply["t2s"], g_params["t2s"], state.g_stats["t2s"],
                    real_t, True)

                def s2t_fwd(x):
                    return g_apply["s2t"](
                        {"params": g_params["s2t"],
                         "batch_stats": state.g_stats["s2t"]},
                        x, train=True, mutable=["batch_stats"])

                outs2, muts2 = jax.vmap(s2t_fwd)(jnp.stack([real_s, fake_s]))
                fake_t, rec_t = outs2[0], outs2[1]
                new_stats["s2t"] = _fold_sequential_stats(
                    state.g_stats["s2t"],
                    jax.tree.map(lambda x: x[0], muts2["batch_stats"]),
                    jax.tree.map(lambda x: x[1], muts2["batch_stats"]))
                rec_s, mut_t2s_fake_t = apply_net(
                    g_apply["t2s"], g_params["t2s"], state.g_stats["t2s"],
                    fake_t, True)
                new_stats["t2s"] = _fold_sequential_stats(
                    state.g_stats["t2s"], mut_t2s_fake_t, mut_t2s_real_t)
            else:
                fake_t, new_stats["s2t"] = apply_net(
                    g_apply["s2t"], g_params["s2t"], state.g_stats["s2t"],
                    real_s, True)
                if cycle:
                    rec_s, stats_t2s = apply_net(
                        g_apply["t2s"], g_params["t2s"], state.g_stats["t2s"],
                        fake_t, True)
                    fake_s, stats_t2s = apply_net(
                        g_apply["t2s"], g_params["t2s"], stats_t2s, real_t, True)
                    rec_t, new_stats["s2t"] = apply_net(
                        g_apply["s2t"], g_params["s2t"], new_stats["s2t"],
                        fake_s, True)
                    new_stats["t2s"] = stats_t2s
            outs["fake_t"] = fake_t
            loss_g_s2t, _ = adv_on_d("t", fake_t)
            metrics["g_s2t"] = loss_g_s2t
            loss = loss_g_s2t

            if cycle:
                outs["fake_s"] = fake_s
                loss_g_t2s, _ = adv_on_d("s", fake_s)
                loss_cycle_s = l1_loss(rec_s, real_s) * cycle_weight
                loss_cycle_t = l1_loss(rec_t, real_t) * cycle_weight
                metrics.update(g_t2s=loss_g_t2s, cycle_s=loss_cycle_s,
                               cycle_t=loss_cycle_t)
                loss = loss + loss_g_t2s + loss_cycle_s + loss_cycle_t

            if with_contour:
                src_gray = real_s if grayscale_source else _gray(real_s)
                contour_real_s = jax.lax.stop_gradient(
                    canny_edges(src_gray, threshold=canny_rgb_threshold))
                contour_real_t = jax.lax.stop_gradient(
                    canny_edges(real_t, threshold=canny_thermal_threshold))
                fake_t_edges = canny_edges(fake_t, threshold=canny_thermal_threshold)
                if contour_detached:
                    fake_t_edges = jax.lax.stop_gradient(fake_t_edges)
                loss_contour_s2t = l1_loss(contour_real_s, fake_t_edges)
                metrics["con_s2t"] = loss_contour_s2t
                loss = loss + loss_contour_s2t
                if cycle:
                    fake_s_gray = outs["fake_s"] if grayscale_source else _gray(outs["fake_s"])
                    fake_s_edges = canny_edges(fake_s_gray, threshold=canny_rgb_threshold)
                    if contour_detached:
                        fake_s_edges = jax.lax.stop_gradient(fake_s_edges)
                    loss_contour_t2s = l1_loss(contour_real_t, fake_s_edges)
                    metrics["con_t2s"] = loss_contour_t2s
                    loss = loss + loss_contour_t2s

            if with_sem:
                h, w = real_s.shape[1], real_s.shape[2]
                pred_fake_t = upsample_logits(
                    sem_apply["t"](sem_vars["t"],
                                   gan_to_seg_tensor(fake_t, "target", sem_norm))["out"], h, w)
                loss_sem_s2t = semantic_consistency(
                    pred_fake_t, label_s, ignore_classes=sem_ignore_classes)
                metrics["sem_s2t"] = loss_sem_s2t
                loss = loss + loss_sem_s2t
                if cycle:
                    pred_real_t = upsample_logits(
                        sem_apply["t"](sem_vars["t"],
                                       gan_to_seg_tensor(real_t, "target", sem_norm))["out"], h, w)
                    pred_fake_s = upsample_logits(
                        sem_apply["s"](sem_vars["s"],
                                       gan_to_seg_tensor(outs["fake_s"], "source", sem_norm))["out"], h, w)
                    loss_sem_t2s = semantic_consistency(
                        pred_fake_s, jnp.argmax(pred_real_t, -1),
                        ignore_classes=sem_ignore_classes)
                    metrics["sem_t2s"] = loss_sem_t2s
                    loss = loss + loss_sem_t2s

            return loss, (metrics, outs, new_stats)

        def adv_on_d(which, fake):
            # D params are closed over read-only: no gradient, no stat update.
            out, _ = d_apply[which]({"params": state.d_params[which],
                                     "batch_stats": state.d_stats[which]},
                                    fake, train=True, mutable=["batch_stats"])
            return adv(out, True), out

        (loss, (metrics, outs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.g_params)
        updates, new_opt_g = state.tx_g.update(grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        g_stats = dict(state.g_stats)
        g_stats.update(new_stats)
        state = state.replace(step=state.step + 1, g_params=g_params,
                              g_stats=g_stats, opt_g=new_opt_g)
        metrics["loss_g"] = loss
        return state, metrics, outs

    def d_core(state: GanTrainState, reals: Dict[str, jax.Array],
               pooled_fakes: Dict[str, jax.Array]):
        def loss_fn(d_params):
            metrics = {}
            new_stats = {}
            total = 0.0
            for which, real in reals.items():
                fake = jax.lax.stop_gradient(pooled_fakes[which])
                if fused_passes:
                    # one 2B pass per discriminator; per-slice BN stats under
                    # vmap, folded in the reference order (real then fake,
                    # train.py:213-218)
                    def d_fwd(x, which=which):
                        return d_apply[which](
                            {"params": d_params[which],
                             "batch_stats": state.d_stats[which]},
                            x, train=True, mutable=["batch_stats"])

                    outs, muts = jax.vmap(d_fwd)(jnp.stack([real, fake]))
                    out_real, out_fake = outs[0], outs[1]
                    stats = _fold_sequential_stats(
                        state.d_stats[which],
                        jax.tree.map(lambda x: x[0], muts["batch_stats"]),
                        jax.tree.map(lambda x: x[1], muts["batch_stats"]))
                else:
                    out_real, stats = apply_net(
                        d_apply[which], d_params[which], state.d_stats[which],
                        real, True)
                    out_fake, stats = apply_net(
                        d_apply[which], d_params[which], stats, fake, True)
                loss_d = 0.5 * (adv(out_real, True) + adv(out_fake, False))
                metrics[f"d_{which}"] = loss_d
                new_stats[which] = stats
                total = total + loss_d
            return total, (metrics, new_stats)

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d_params)
        updates, new_opt_d = state.tx_d.update(grads, state.opt_d, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        state = state.replace(d_params=d_params, d_stats=new_stats, opt_d=new_opt_d)
        return state, metrics

    return g_core, d_core


def make_gan_steps(**kwargs):
    """Build (g_step, d_step): the two separately-jitted updates with the
    host-side ImagePool boundary in between (reference-faithful loop shape,
    train.py:208-223). See _make_gan_cores for the argument list."""
    g_core, d_core = _make_gan_cores(**kwargs)
    g_step = jax.jit(g_core, static_argnames=("with_sem",), donate_argnums=0)
    d_step = jax.jit(d_core, donate_argnums=0)
    return g_step, d_step


def make_fused_gan_step(*, pool_size: int = 50, **kwargs):
    """ONE jitted step: G update -> device ImagePool query -> D update.

    The reference alternates G and D with a host-side ImagePool in between
    (train.py:208-223, misc.py:135-183); over the axon tunnel that host
    boundary serializes every iteration (measured: the two-step + host-pool
    loop runs at 1.3 steps/s vs the fused step's device-resident pool).

    Returns (step, make_pools) where
      step(state, pools, real_s, real_t, label_s=None, sem_vars=None,
           with_sem=False, with_outs=False) -> (state, pools, metrics)
      make_pools(shapes: {name: (H, W, C)}, dtype, seed) -> {name: DevicePool}

    ``with_outs=True`` (static) additionally returns the generated images in
    metrics under 'out_fake_t'/'out_fake_s' — for the reference's every-10-iter
    visdom image panels (train.py:241-246). Off by default so the standard
    program ships no extra outputs.
    """
    from ..ops.image_pool import create_device_pool, device_pool_query

    cycle = kwargs.get("cycle", True)
    g_core, d_core = _make_gan_cores(**kwargs)

    @functools.partial(jax.jit, static_argnames=("with_sem", "with_outs"),
                       donate_argnums=(0, 1))
    def step(state: GanTrainState, pools, real_s, real_t, label_s=None,
             sem_vars=None, *, with_sem: bool = False, with_outs: bool = False):
        state, metrics, outs = g_core(state, real_s, real_t, label_s,
                                      sem_vars, with_sem=with_sem)
        reals = {"t": real_t}
        fakes = {}
        fakes["t"], pools["t"] = device_pool_query(pools["t"], outs["fake_t"],
                                                   pool_size=pool_size)
        if cycle:
            reals["s"] = real_s
            fakes["s"], pools["s"] = device_pool_query(
                pools["s"], outs["fake_s"], pool_size=pool_size)
        state, d_metrics = d_core(state, reals, fakes)
        metrics = {**metrics, **d_metrics}
        if with_outs:
            metrics.update({f"out_{k}": v for k, v in outs.items()})
        return state, pools, metrics

    def make_pools(shapes, *, dtype=jnp.float32, seed: int = 0):
        return {name: create_device_pool(pool_size, shape, dtype=dtype,
                                         seed=seed + i)
                for i, (name, shape) in enumerate(sorted(shapes.items()))}

    return step, make_pools
