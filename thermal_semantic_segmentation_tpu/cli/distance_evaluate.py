"""Translation-distance evaluation entry point (reference distance_evaluate.py).

L1 + SSIM between original Freiburg images and their saved translations over
the seed-42 20% validation split.

Usage: python -m thermal_semantic_segmentation_tpu.cli.distance_evaluate [flags]
"""

from __future__ import annotations

from ..data.loader import DataLoader, split_indices
from ..data.simple import DistanceDataset
from ..eval.distance import evaluate_distance
from .options import translation_parse


def main(argv=None):
    parser = translation_parse()
    from .options import str2bool
    parser.add_argument("--per_class", type=str2bool, default=False,
                        help="additionally report mean L1 per segmentation "
                             "class (needs the label list next to the data "
                             "list). A global L1 cannot see a rare class "
                             "translated into another class's intensity "
                             "range — per-class L1 can (the reference's "
                             "distance_evaluate.py has no per-class view).")
    parser.add_argument("--num_classes", type=int, default=13)
    args = parser.parse_args(argv)
    dataset = DistanceDataset(args.freiburg_root,
                              translate_name=args.checkpoint_name.replace(".pth", ""),
                              with_label=args.per_class)
    _, val_idx = split_indices(len(dataset), 0.2, seed=42)
    # under --distributed each process scores a disjoint slice and the
    # L1/SSIM/per-class accumulators reduce across processes (exact partition
    # via shard_lockstep=False; per-process drop_last may trim a tail batch,
    # same as every sharded offline CLI)
    from ..parallel.mesh import host_shard
    shard = host_shard()
    # clamp the batch to the SMALLEST per-process shard (floor(n/nproc)), not
    # the global count: drop_last=True on an over-large batch would silently
    # drop every sample on every rank and report a perfect-looking L1
    n_local = len(val_idx) if shard is None else len(val_idx) // shard[1]
    loader = DataLoader(dataset, min(args.batch_size, max(n_local, 1)),
                        shuffle=True, indices=val_idx, drop_last=True,
                        shard=shard, shard_lockstep=False)
    from ._common import resolve_wire
    # SSIM/L1 run in f32 regardless of --bf16: never bf16 the wire here
    wire = resolve_wire(args, bf16_compute=False)
    print("Model: " + args.checkpoint_name.replace(".pth", ""))
    if args.per_class:
        from ..eval.metrics import FREIBURG_CLASS_NAMES
        avg_l1, avg_ssim, per_class = evaluate_distance(
            loader, wire=wire, num_classes=args.num_classes,
            reduce_processes=shard is not None)
        # class names are the eval protocol's, minus their "IoU " prefix;
        # index 12 is the ignore class
        names = [n.removeprefix("IoU ") for n in FREIBURG_CLASS_NAMES]
        names += ["ignore"] * max(0, args.num_classes - len(names))
        for k, v in enumerate(per_class):
            name = names[k] if k < len(names) else str(k)
            print(f"translation per-class L1 {name}: {v}")
    else:
        avg_l1, avg_ssim = evaluate_distance(
            loader, wire=wire, reduce_processes=shard is not None)
    print("L1 distance: " + str(avg_l1))
    print("SSIM score: " + str(avg_ssim))
    return avg_l1, avg_ssim


if __name__ == "__main__":
    main()
