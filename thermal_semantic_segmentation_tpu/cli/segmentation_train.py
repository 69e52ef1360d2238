"""Supervised segmentation training entry point.

TPU-native equivalent of the reference ``segmentation_train.py``: same recipe
(80/20 seed-42 split, Adam + ReduceLROnPlateau on source-val loss, CE with
ignore_index, per-epoch source-val + Freiburg-IR-test mIoU logging, best-val
checkpointing), with the whole train step fused under jit and the batch
sharded over the device mesh.

Usage: python -m thermal_semantic_segmentation_tpu.cli.segmentation_train [flags]
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from ..core.schedule import ReduceLROnPlateau
from ..data.loader import DataLoader, split_indices
from ..eval.validate import seg_validate
from ..parallel.mesh import host_shard, make_mesh, replicate
from ..train.seg import build_seg_eval_step, create_seg_state, make_seg_train_step
from ..utils.logging import get_logger
from ..utils.meters import AverageMeter, ProgressMeter
from ._common import (apply_model_meta, build_deeplab, build_seg_dataset,
                      load_seg_checkpoint, model_meta, resolve_wire,
                      save_seg_checkpoint, train_transform, val_transform)
from .options import seg_parse


def seg_main(args, logger, shutdown=None):
    from ..utils.preempt import NullShutdown, cross_process
    shutdown = cross_process(
        shutdown if shutdown is not None else NullShutdown())
    mesh = make_mesh(batch_size=args.batch_size)
    # --data_parallel additionally shards the VALIDATION loops over the
    # training mesh (one extra eval compile); training always shards.
    val_mesh = None
    if getattr(args, "data_parallel", False):
        if args.val_batch_size % mesh.size == 0:
            val_mesh = mesh
        else:
            print(f"val_batch_size {args.val_batch_size} does not divide "
                  f"the {mesh.size}-device mesh; validation stays "
                  f"single-device")
    device_aug = getattr(args, "device_aug", False)
    if device_aug:
        # host pipeline only decodes full-res frames; crop/flip run on device
        from ..data import transforms as T
        src_transform = T.Compose([T.ToArray()])
    else:
        src_transform = train_transform()
    source_dataset = build_seg_dataset(args, src_transform)
    from ..data.freiburg import FreiburgTest
    target_val_dataset = FreiburgTest(args.freiburg_root, "test", "IR",
                                      transforms=val_transform(), with_label=True)
    logger.info("Dataset created. Train with %s_%s, validate with FreiburgTest.",
                source_dataset.__class__.__name__, args.translation_name)

    train_idx, val_idx = split_indices(len(source_dataset), 0.2, seed=42)
    train_loader = DataLoader(source_dataset, args.batch_size, shuffle=True,
                              indices=train_idx, drop_last=True, seed=args.seed,
                              shard=host_shard())
    # NOTE: the reference validates through the train dataset's (augmenting)
    # transform (segmentation_train.py:143); with device_aug the crop lives in
    # the train step, so the val split gets the deterministic resize instead.
    val_source = (build_seg_dataset(args, val_transform()) if device_aug
                  else source_dataset)
    # drop_last=False + pad_to_batch in seg_validate: the tail batch is
    # ignore-padded (metric-exact), so mIoU covers every val image even at
    # val_batch_size > 1 (the reference protocol evaluates all, batch 1).
    val_loader = DataLoader(val_source, args.val_batch_size, shuffle=True,
                            indices=val_idx, drop_last=False, seed=args.seed + 1)
    target_val_loader = DataLoader(target_val_dataset, args.val_batch_size,
                                   shuffle=False, drop_last=False, seed=args.seed + 2)

    restart_epoch = 0
    lowest_val_loss = float("inf")
    if args.load_model:
        path = os.path.join(args.model_root_path, args.checkpoint_name)
        variables, meta = load_seg_checkpoint(path)
        apply_model_meta(args, meta)  # ckpt arch keys beat stale flags
        restart_epoch = int(meta.get("epoch", -1)) + 1
        if "val_loss" in meta:
            lowest_val_loss = float(meta["val_loss"])
        logger.info("loaded %s, resume from epoch %d", path, restart_epoch)
        model, _ = build_deeplab(args, abstract=True)
    else:
        model, variables = build_deeplab(args)

    state = create_seg_state(model, variables, learning_rate=args.lr,
                             lr_groups=getattr(args, "lr_groups", False))
    state = replicate(mesh, state)
    train_step = make_seg_train_step(ignore_index=args.ignore_index,
                                     label_hw=(256, 512), base_lr=args.lr,
                                     dropout_seed=args.seed,
                                     device_augment=device_aug,
                                     bn_mode=getattr(args, "bn_mode", "sync"),
                                     mesh=mesh,
                                     grad_accum=getattr(args, "grad_accum", 1))
    eval_step = build_seg_eval_step(model, num_classes=args.num_classes,
                                    ignore_index=args.ignore_index,
                                    label_hw=(256, 512))
    scheduler = ReduceLROnPlateau(mode="min")

    os.makedirs(args.model_root_path, exist_ok=True)
    from ..utils.observability import MetricsLogger
    metrics_log = MetricsLogger(os.path.join(args.logdir, "metrics.jsonl"))
    for epoch in range(restart_epoch, restart_epoch + args.epochs):
        print(f"--------START TRAINING [EPOCH: {epoch}]--------")
        train_loss = AverageMeter("train_loss", ":3.4f")
        images_per_sec = AverageMeter("img/s", ":5.1f")
        progress = ProgressMeter(len(train_loader), [train_loss, images_per_sec],
                                 prefix=f"Epoch: [{epoch}]")
        last = time.perf_counter()
        from ..data.device_pipeline import device_prefetch
        wire = resolve_wire(args)
        for i, batch in enumerate(device_prefetch(
                train_loader, mesh, wire=wire)):
            if args.max_steps and i >= args.max_steps:
                break
            if shutdown.requested:
                break
            state, loss = train_step(state, batch["image"], batch["label"])
            if i % args.log_interval == 0:
                bs = batch["image"].shape[0]
                loss_val = float(loss)  # host sync only at log points
                now = time.perf_counter()
                train_loss.update(loss_val, bs)
                images_per_sec.update(
                    bs * args.log_interval / max(now - last, 1e-9))
                last = now
                progress.display(i, logger)
                metrics_log.log(int(state.step), {"train_loss": loss_val,
                                                  "images_per_sec": images_per_sec.val},
                                epoch=epoch)

        if shutdown.requested:
            # preempted mid-epoch: persist a resumable checkpoint (the
            # interrupted epoch is redone in full on resume) and exit before
            # validation — preemption grace windows are short
            path = os.path.join(args.model_root_path,
                                "preempt_" + args.new_checkpoint_name)
            save_seg_checkpoint(path, jax.device_get(state.variables),
                                epoch=epoch - 1, val_loss=lowest_val_loss,
                                **model_meta(args))
            from ._common import primary_host
            wrote = (f"saved {path}" if primary_host()
                     else f"save delegated to process 0 "
                          f"(rank {jax.process_index()} exiting)")
            msg = (f"preempted (signal {shutdown.signum}) during epoch "
                   f"{epoch}; {wrote} — resume with -load_model true "
                   f"-checkpoint_name preempt_{args.new_checkpoint_name}")
            print(msg); logger.info(msg)
            return state

        mean_iu, val_loss, class_iou = seg_validate(
            model, state.variables, val_loader, num_classes=args.num_classes,
            ignore_index=args.ignore_index, eval_step=eval_step,
            pad_to_batch=args.val_batch_size, wire=resolve_wire(args),
            mesh=val_mesh)
        scale = scheduler.step(val_loss)
        state = state.replace(lr_scale=jnp.asarray(scale, jnp.float32))

        if val_loss < lowest_val_loss:
            from ._common import primary_host
            verb = ("Saving..." if primary_host()
                    else "Save delegated to process 0.")
            msg = f"val loss reduced from {lowest_val_loss} to {val_loss}! {verb}"
            lowest_val_loss = val_loss
            save_seg_checkpoint(
                os.path.join(args.model_root_path, args.new_checkpoint_name),
                jax.device_get(state.variables), epoch=epoch,
                val_loss=lowest_val_loss, **model_meta(args))
        else:
            msg = "Model not improved."
        print(msg); logger.info(msg)
        print("mean iou score: " + str(mean_iu)); logger.info("mean iou score: %s", mean_iu)
        for k, v in class_iou.items():
            line = f"source valid set class {k}: {v}"
            logger.info(line); print(line)

        if args.net_mode == "one_channel":
            mean_iu, val_loss, class_iou = seg_validate(
                model, state.variables, target_val_loader, num_classes=13,
                ignore_index=args.ignore_index, eval_step=eval_step,
                pad_to_batch=args.val_batch_size, wire=resolve_wire(args),
                mesh=val_mesh)
            line = "target test dataset mean iou score: " + str(mean_iu)
            logger.info(line); print(line)
            for k, v in class_iou.items():
                line = f"target set class {k}: {v}"
                logger.info(line); print(line)
        else:
            # the target test split is 1-channel IR (FreiburgTest above); a
            # 3-channel net (e.g. an RGB sem net pretrained for -sem_mode
            # module2) cannot consume it — the reference only ever trains
            # one-channel nets here so the mismatch never arose
            line = "target test dataset skipped (net is not one_channel)"
            logger.info(line); print(line)
    return state


def main(argv=None):
    args = seg_parse().parse_args(argv)
    args.logdir = os.path.join("logs", args.new_checkpoint_name.replace(".pth", ""))
    os.makedirs(args.logdir, exist_ok=True)
    logger = get_logger(args.logdir)
    from ..utils.preempt import GracefulShutdown
    with GracefulShutdown() as shutdown:
        seg_main(args, logger, shutdown=shutdown)


if __name__ == "__main__":
    main()
