"""Pseudo-label generation (reference generate_pseudo_label.py:60-96).

Device side: one jitted function computes softmax / argmax / confidence
(with optional horizontal-flip TTA averaged at input resolution,
generate_pseudo_label.py:81-84). Host side: PNG/NPY writes stream through a
thread pool so disk IO overlaps the next batch's compute — the reference
serializes a per-image .cpu().numpy() + save inside the loop.
"""

from __future__ import annotations

import concurrent.futures as cf
import os


import jax
import jax.numpy as jnp
import numpy as np

from ..data.palette import colorize_prediction, freiburg_palette
from ..ops.batching import pad_batch_dicts
from ..ops.resize import resize_bilinear


def make_pseudo_fns(model):
    @jax.jit
    def soft_fn(variables, images):
        out = model.apply(variables, images, train=False)
        return jax.nn.softmax(out["out"].astype(jnp.float32), axis=-1)

    @jax.jit
    def hard_fn(variables, images):
        probs = soft_fn(variables, images)
        conf = jnp.max(probs, axis=-1)
        pseudo = jnp.argmax(probs, axis=-1)
        return conf, pseudo

    @jax.jit
    def hard_flip_fn(variables, images):
        # NOTE: concatenating the flipped batch into one 2B pass was measured
        # SLOWER (281 vs 294 img/s at B=8) — fwd-only at batch 8 is not
        # latency-bound, unlike the batch-4 train steps (see train/self_train
        # fused_student). Two B-batch passes stay.
        h, w = images.shape[1:3]
        probs = resize_bilinear(soft_fn(variables, images), h, w)
        probs_f = resize_bilinear(soft_fn(variables, images[:, :, ::-1]), h, w)
        avg = (probs + probs_f[:, :, ::-1]) / 2.0
        return jnp.max(avg, axis=-1), jnp.argmax(avg, axis=-1)

    return soft_fn, hard_fn, hard_flip_fn


def generate_pseudo_labels(model, variables, loader, *, save_path: str,
                           soft: bool = False, flip: bool = False,
                           max_steps: int = 0, writer_threads: int = 8,
                           native_encode: bool = False,
                           wire: str | None = "packed",
                           pad_to_batch: int | None = None, mesh=None):
    """Run inference over the loader and write pseudo-label artifacts.

    pad_to_batch: pad a partial tail batch (drop_last=False serves every
    image, any dataset size) to this size with zeros so each jitted forward
    keeps ONE compiled shape; only the real rows are written. Compiles over
    the axon tunnel cost minutes, so a tail recompile is never worth it.
    (The reference instead relies on drop_last=True and silently skips the
    tail, generate_pseudo_label.py:33-38.)

    mesh: shard each (host-padded) batch over the mesh's data axis and run
    the forward SPMD across chips; variables should be mesh-replicated.
    Requires pad_to_batch divisible by mesh.size.

    soft: per-image full softmax .npy (channel-first (C, h, w) to match the
          reference file format consumed by the self-train dataset).
    hard: argmax PNG + palette-colored PNG + float16 confidence .npy.
    native_encode: write the two PNGs through the C++ batch encoder (one call
          per batch, libpng in a thread pool) instead of per-image PIL.
    """
    os.makedirs(save_path, exist_ok=True)
    soft_fn, hard_fn, hard_flip_fn = make_pseudo_fns(model)
    palette = freiburg_palette()
    if native_encode:
        from ..data import native_loader as nl
        native_encode = nl.available()

    def write_soft(name: str, probs: np.ndarray):
        np.save(os.path.join(save_path, name.replace(".png", ".npy")),
                probs.transpose(2, 0, 1))

    def write_hard(name: str, pseudo: np.ndarray, conf: np.ndarray):
        from PIL import Image
        Image.fromarray(pseudo.astype(np.uint8)).save(
            os.path.join(save_path, name))
        colorize_prediction(pseudo, palette).save(
            os.path.join(save_path, name[:-4] + "_color.png"))
        np.save(os.path.join(save_path, name.replace(".png", "_conf.npy")),
                conf.astype(np.float16))

    from ..data.device_pipeline import device_prefetch

    if mesh is not None and (pad_to_batch is None or pad_to_batch % mesh.size):
        raise ValueError(
            f"sharded pseudo-gen needs pad_to_batch (got {pad_to_batch}) "
            f"divisible by the {mesh.size}-device mesh")

    padded = pad_batch_dicts(iter(loader), pad_to_batch, {"image": 0.0},
                             keep=("img_path",))
    n_written = 0
    with cf.ThreadPoolExecutor(max_workers=writer_threads) as pool:
        futures = []
        for i, batch in enumerate(device_prefetch(padded, mesh, wire=wire)):
            if max_steps and i >= max_steps:
                break
            images = jnp.asarray(batch["image"])
            names = batch["img_path"]
            real_bs = batch["real_bs"]
            if soft:
                probs = np.asarray(soft_fn(variables, images))[:real_bs]
                for k in range(real_bs):
                    futures.append(pool.submit(write_soft, os.path.basename(names[k]),
                                               probs[k]))
            else:
                fn = hard_flip_fn if flip else hard_fn
                conf, pseudo = fn(variables, images)
                conf = np.asarray(conf)[:real_bs]
                pseudo = np.asarray(pseudo)[:real_bs]
                if native_encode:
                    from ..data import native_loader as nl
                    base = [os.path.join(save_path, os.path.basename(n))
                            for n in names]
                    pal = np.asarray(palette, np.uint8).reshape(-1, 3)
                    futures.append(pool.submit(
                        nl.encode_batch, base, pseudo.astype(np.uint8)))
                    futures.append(pool.submit(
                        nl.encode_pal8_batch,
                        [b[:-4] + "_color.png" for b in base],
                        pseudo.astype(np.uint8), pal))
                    for k in range(real_bs):
                        futures.append(pool.submit(
                            np.save,
                            base[k].replace(".png", "_conf.npy"),
                            conf[k].astype(np.float16)))
                else:
                    for k in range(real_bs):
                        futures.append(pool.submit(
                            write_hard, os.path.basename(names[k]),
                            pseudo[k], conf[k]))
            n_written += real_bs
            if i % 100 == 0:
                print(f"pseudo label generation: [{i}/{len(loader)}]")
        for f in futures:
            f.result()
    return n_written
