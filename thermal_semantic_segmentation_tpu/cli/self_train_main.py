"""Self-training entry point (reference self_train_main.py:18-140).

Consumes the artifacts of cli.generate_pseudo_label (soft + hard pseudo
labels) and cli.cal_prototype (class prototypes), then runs the prototype-
rectified self-training loop with an EMA teacher, validating on Freiburg-IR
test every ``--val_interval`` steps and checkpointing best/last.

Usage: python -m thermal_semantic_segmentation_tpu.cli.self_train_main [flags]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_checkpoint
from ..core.schedule import ReduceLROnPlateau
from ..data.freiburg import Freiburg, FreiburgTest
from ..data.loader import DataLoader
from ..parallel.mesh import host_shard
from ..data.self_train_aug import SelfTrainAugment
from ..eval.validate import seg_validate
from ..models.deeplab import create_deeplab
from ..train.seg import build_seg_eval_step
from ..train.self_train import create_self_train_state, make_self_train_step
from ..utils.logging import get_logger
from ..utils.meters import AverageMeter, ProgressMeter
from ._common import (apply_model_meta, load_seg_checkpoint, model_meta,
                      resolve_wire, save_seg_checkpoint, train_transform,
                      val_transform)
from .cal_prototype import prototype_path
from .options import self_train_parse


def self_train_main(args, logger, shutdown=None):
    from ..utils.preempt import NullShutdown, cross_process
    shutdown = cross_process(
        shutdown if shutdown is not None else NullShutdown())
    source_dataset = Freiburg(args.freiburg_root, "train", "RGB",
                              translation_name=args.translation_name,
                              segmentation_mode=True, transforms=train_transform())
    target_dataset = Freiburg(
        args.freiburg_root, "train", "IR", segmentation_mode=True,
        self_train=args.self_train,
        augmentations=SelfTrainAugment(args.resize, tuple(args.rcrop), args.hflip),
        path_soft=args.path_soft, path_lp=args.path_lp,
        threshold=args.threshold, ignore_index=args.ignore_index,
        proto_rectify=args.proto_rectify)
    target_val_dataset = FreiburgTest(args.freiburg_root, "test", "IR",
                                      transforms=val_transform(), with_label=True)

    src_loader = DataLoader(source_dataset, args.batch_size, shuffle=True,
                            drop_last=True, seed=args.seed, shard=host_shard())
    tgt_loader = DataLoader(target_dataset, args.batch_size, shuffle=True,
                            drop_last=True, seed=args.seed + 1,
                            shard=host_shard())
    val_loader = DataLoader(target_val_dataset, args.batch_size, shuffle=False,
                            drop_last=False, seed=args.seed + 2)

    restart_epoch = 0
    meta = {}
    if args.load_model:
        variables, meta = load_seg_checkpoint(
            os.path.join(args.model_root_path, args.checkpoint_name))
        apply_model_meta(args, meta)  # ckpt arch keys beat stale flags
        restart_epoch = int(meta.get("epoch", -1)) + 1
        logger.info("loaded %s, resume from epoch %d", args.checkpoint_name,
                    restart_epoch)
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    model, init_variables = create_deeplab(
        jax.random.key(args.seed), num_classes=args.num_classes,
        num_channels=1, abstract=args.load_model, dtype=dtype,
        remat=getattr(args, "remat", "none"),
        layers=getattr(args, "layers", (3, 4, 23, 3)))
    if not args.load_model:
        variables = init_variables

    if "objective_vectors" in meta:
        # resuming from a self-train checkpoint (best/last/preempt_): its
        # moving prototypes ARE the training state — the offline prototype
        # artifact belongs to the original source checkpoint's name and
        # would be both stale and (for renamed resumes) missing
        prototypes = np.asarray(meta["objective_vectors"])
    else:
        proto_ckpt = load_checkpoint(
            prototype_path(args.root, args.target_dataset,
                           args.checkpoint_name))
        prototypes = np.asarray(proto_ckpt["objective_vectors"])

    from ..parallel.mesh import make_mesh, replicate
    mesh = make_mesh(batch_size=args.batch_size)
    # --data_parallel additionally shards the validation loop over the
    # training mesh (pad_to_batch == batch_size always divides it)
    val_mesh = mesh if getattr(args, "data_parallel", False) else None
    state = replicate(mesh, create_self_train_state(
        model, variables, prototypes=prototypes, learning_rate=args.lr,
        num_classes=args.num_classes))
    step = make_self_train_step(
        model, num_classes=args.num_classes, ignore_index=args.ignore_index,
        base_lr=args.lr, proto_temperature=args.proto_temperature,
        train_thred=args.train_thred, rce=args.rce, rce_alpha=args.rce_alpha,
        rce_beta=args.rce_beta, proto_rectify=args.proto_rectify, ema=args.ema,
        moving_prototype=args.moving_prototype,
        proto_momentum=args.proto_momentum,
        label_hw=(args.rcrop[1], args.rcrop[0]), dropout_seed=args.seed)
    eval_step = build_seg_eval_step(model, num_classes=args.num_classes,
                                    ignore_index=args.ignore_index)
    scheduler = ReduceLROnPlateau(mode="min")  # reference feeds mean_iu to a
    # 'min' plateau scheduler (self_train_main.py:67,117) — kept for parity.

    # resume restores the best-so-far threshold (else a resumed run would
    # overwrite the true best checkpoint with a worse one)
    highest_mean_iu = float(meta.get("highest_mean_iu",
                                     args.initial_best_miou))
    os.makedirs(os.path.join(args.root, args.model_root_path), exist_ok=True)

    def save(tag: str, epoch: int):
        save_seg_checkpoint(
            os.path.join(args.root, args.model_root_path,
                         tag + args.new_checkpoint_name),
            jax.device_get(state.variables), epoch=epoch,
            highest_mean_iu=highest_mean_iu,
            objective_vectors=np.asarray(state.prototypes),
            **model_meta(args))

    stale_vals = 0  # consecutive non-improving validations (drift guard)
    for epoch in range(restart_epoch, restart_epoch + args.epochs):
        pseudo_loss = AverageMeter("pseudo_loss", ":3.4f")
        s_loss = AverageMeter("s_loss", ":3.4f")
        progress = ProgressMeter(len(tgt_loader), [pseudo_loss, s_loss],
                                 prefix=f"Epoch: [{epoch}]")
        from ..data.device_pipeline import device_prefetch
        # packed_bf16 always downgrades here: even with --bf16 model compute,
        # the soft pseudo-labels feed the f32 rectification math
        # (train/self_train.py prototype_weights), so bf16-on-the-wire would
        # change pseudo-label numerics.
        wire = resolve_wire(args, bf16_compute=False)

        def merged_batches():
            for t_batch, s_batch in zip(tgt_loader, src_loader):
                m = {"s_image": s_batch["image"], "s_label": s_batch["label"],
                     "t_image": t_batch["image"],
                     "t_full": t_batch["image_full"],
                     "t_hard": t_batch["label_hard"],
                     "wp": t_batch["weak_params"]}
                if "label_soft" in t_batch:
                    m["t_soft"] = t_batch["label_soft"]
                yield m

        for i, b in enumerate(device_prefetch(
                merged_batches(), mesh, wire=wire)):
            if args.max_steps and i >= args.max_steps:
                break
            if shutdown.requested:
                break
            state, loss_pseudo, loss_source = step(
                state, b["s_image"], b["s_label"], b["t_image"], b["t_full"],
                b.get("t_soft"), b["t_hard"], b["wp"])
            if i % 10 == 0:
                pseudo_loss.update(float(loss_pseudo), args.batch_size)
                s_loss.update(float(loss_source), args.batch_size)
                progress.display(i, logger)

            if i % args.val_interval == 0 or i == len(tgt_loader) - 1:
                mean_iu, val_loss, class_iou = seg_validate(
                    model, state.variables, val_loader,
                    num_classes=args.num_classes,
                    ignore_index=args.ignore_index, eval_step=eval_step,
                    pad_to_batch=args.batch_size, wire=wire, mesh=val_mesh,
                    visualize=args.visualize_prediction,
                    save_root=os.path.join(args.root, "predictions",
                                           args.new_checkpoint_name.replace(".pth", "")),
                    iter_counter=args.iter_counter)
                msg = "target test dataset mean iou score: " + str(mean_iu)
                logger.info(msg); print(msg)
                for k, v in class_iou.items():
                    line = f"target set class {k}: {v}"
                    logger.info(line); print(line)
                scale = scheduler.step(mean_iu)
                state = state.replace(lr_scale=jnp.asarray(scale, jnp.float32))
                if mean_iu > highest_mean_iu:
                    highest_mean_iu = mean_iu
                    stale_vals = 0
                    from ._common import primary_host
                    verb = ("Saving..." if primary_host()
                            else "save delegated to process 0")
                    print(f"mean iou improved to {mean_iu}! {verb}")
                    save("best", epoch)
                else:
                    print("Model not improved.")
                    stale_vals += 1
                    if (args.early_stop_patience
                            and stale_vals >= args.early_stop_patience):
                        # self-train drifts past its peak when pseudo-label
                        # quality is low (round-3 pipeline gate measured
                        # 0.3767 -> 0.326 over the 2 epochs after the best
                        # validation); best-ckpt selection keeps the peak,
                        # early stop keeps the chip hours
                        msg = (f"early stop: no target-mIoU improvement in "
                               f"{stale_vals} consecutive validations "
                               f"(best {highest_mean_iu:.4f})")
                        print(msg); logger.info(msg)
                        save("last", epoch)
                        return state
            args.iter_counter += 1
        if shutdown.requested:
            # preempted mid-epoch: distinct resumable checkpoint (same
            # schema incl. prototypes); the epoch is redone on resume.
            # "preempt_" with the underscore: the documented convention
            # (utils/preempt.py) shared with the seg and GAN trainers.
            save("preempt_", epoch - 1)
            from ._common import primary_host
            wrote = (f"saved preempt_{args.new_checkpoint_name}"
                     if primary_host() else
                     f"preempt_{args.new_checkpoint_name} save delegated "
                     f"to process 0")
            msg = (f"preempted (signal {shutdown.signum}) during epoch "
                   f"{epoch}; {wrote} — "
                   f"resume with -load_model true -checkpoint_name "
                   f"preempt_{args.new_checkpoint_name} --path_soft "
                   f"{args.path_soft} --path_lp {args.path_lp} (pseudo-label "
                   f"paths otherwise re-derive from the new checkpoint name)")
            print(msg); logger.info(msg)
            return state
        save("last", epoch)
    return state


def main(argv=None):
    parser = self_train_parse()
    parser.add_argument("--initial_best_miou", type=float, default=0.0,
                        help="save threshold (the reference hardcodes 0.52, "
                             "self_train_main.py:53).")
    parser.add_argument("--early_stop_patience", type=int, default=0,
                        help="stop after N consecutive non-improving "
                             "target validations (0 = off, the reference "
                             "behavior); guards against self-train drift "
                             "past the peak when pseudo-label quality is "
                             "low.")
    args = parser.parse_args(argv)
    if not args.path_soft:
        args.path_soft = os.path.join(args.root, "pseudo_labels", args.pseudo_type,
                                      args.checkpoint_name.replace(".pth", ""))
    if not args.path_lp:
        args.path_lp = os.path.join(args.root, "pseudo_labels", "hard",
                                    args.checkpoint_name.replace(".pth", ""))
    args.logdir = os.path.join("logs", "self-training",
                               args.new_checkpoint_name.replace(".pth", ""))
    os.makedirs(args.logdir, exist_ok=True)
    logger = get_logger(args.logdir)
    from ..utils.preempt import GracefulShutdown
    with GracefulShutdown() as shutdown:
        self_train_main(args, logger, shutdown=shutdown)


if __name__ == "__main__":
    main()
