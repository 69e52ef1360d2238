"""Segmentation evaluation entry point (reference segmentation_evaluate.py).

Loads a checkpoint (native msgpack or reference torch .pth), runs batch
inference with on-device metric accumulation, prints mIoU / val loss /
per-class IoUs in the reference format.

Usage: python -m thermal_semantic_segmentation_tpu.cli.segmentation_evaluate [flags]
"""

from __future__ import annotations

import os

from ..data.loader import DataLoader, split_indices
from ..eval.validate import seg_validate
from ._common import (apply_model_meta, build_deeplab, build_seg_dataset,
                      load_seg_checkpoint, resolve_wire, val_transform)
from .options import evaluation_parse


def seg_evaluation(args):
    print("evaluating...")
    dataset = build_seg_dataset(args, val_transform(), for_eval=True)

    # drop_last=False + pad_to_batch below: every image is scored (the
    # reference protocol is batch-1-over-all, segmentation_evaluate.py:24-80);
    # the ignore-padded tail batch is metric-exact and avoids a recompile.
    # Under --distributed each process scores a disjoint dataset slice and
    # the confusion matrices sum across processes (reduce_processes below) —
    # exact, since the histogram is additive over images. Visualization dumps
    # use a per-process-unaware filename namespace, so they force the
    # single-slice path with a warning — and only process 0 writes the PNGs
    # (concurrent identical-path writes on the shared filesystem multi-host
    # runs require would interleave and corrupt them).
    from ..parallel.mesh import host_shard
    from ._common import primary_host
    shard = host_shard()
    visualize = args.visualize_prediction
    if shard is not None and visualize:
        if primary_host():  # one copy of the warning, not one per rank
            print("--visualize_prediction with --distributed: every process "
                  "evaluates the full set (prediction filenames would "
                  "collide across hosts); process 0 writes the PNGs")
        shard = None
        if not primary_host():
            visualize = None
    if args.data_split:
        _, val_idx = split_indices(len(dataset), 0.2, seed=42)
        loader = DataLoader(dataset, args.val_batch_size, shuffle=True,
                            indices=val_idx, drop_last=False, seed=args.seed,
                            shard=shard, shard_lockstep=False)
    else:
        loader = DataLoader(dataset, args.val_batch_size, shuffle=False,
                            drop_last=False, seed=args.seed,
                            shard=shard, shard_lockstep=False)

    path = os.path.join(args.model_root_path, args.checkpoint_name)
    variables, meta = load_seg_checkpoint(path)
    apply_model_meta(args, meta)  # ckpt arch keys beat stale flags
    model, _ = build_deeplab(args, abstract=True)  # checkpoint supplies variables

    save_root = None
    if visualize:
        save_root = os.path.join(
            args.root, "predictions",
            (args.new_checkpoint_name or args.checkpoint_name).replace(".pth", ""))
        if args.baseline:
            save_root = (f"baseline_predictions/apply_{args.target_domain}"
                         f"_image_on_{args.source_domain}_domain_model")
        if args.generator_type == "t2s":
            save_root = f"predictions/t2s/{args.checkpoint_name.replace('.pth', '')}"

    from ._common import maybe_data_parallel
    mesh, variables = maybe_data_parallel(args, variables,
                                          args.val_batch_size, "evaluating")

    mean_iu, avg_loss, class_iou = seg_validate(
        model, variables, loader, num_classes=args.num_classes,
        ignore_index=args.ignore_index, visualize=visualize,
        save_root=save_root, pad_to_batch=args.val_batch_size,
        wire=resolve_wire(args), mesh=mesh,
        reduce_processes=shard is not None)
    print("checkpoint name: " + args.checkpoint_name)
    print(f"mean iou score: [{mean_iu}]. val_loss: [{avg_loss}]")
    for k, v in class_iou.items():
        print(f"target set class {k}: {v}")
    return mean_iu, avg_loss, class_iou


def main(argv=None):
    seg_evaluation(evaluation_parse().parse_args(argv))


if __name__ == "__main__":
    main()
