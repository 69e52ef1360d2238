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
    args = translation_parse().parse_args(argv)
    dataset = DistanceDataset(args.freiburg_root,
                              translate_name=args.checkpoint_name.replace(".pth", ""))
    _, val_idx = split_indices(len(dataset), 0.2, seed=42)
    loader = DataLoader(dataset, min(args.batch_size, max(len(val_idx), 1)),
                        shuffle=True, indices=val_idx, drop_last=True)
    from ._common import resolve_wire
    # SSIM/L1 run in f32 regardless of --bf16: never bf16 the wire here
    avg_l1, avg_ssim = evaluate_distance(
        loader, wire=resolve_wire(args, bf16_compute=False))
    print("Model: " + args.checkpoint_name.replace(".pth", ""))
    print("L1 distance: " + str(avg_l1))
    print("SSIM score: " + str(avg_ssim))
    return avg_l1, avg_ssim


if __name__ == "__main__":
    main()
