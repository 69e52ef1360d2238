"""Pseudo-label generation entry point (reference generate_pseudo_label.py).

Usage: python -m thermal_semantic_segmentation_tpu.cli.generate_pseudo_label [flags]
"""

from __future__ import annotations

import os

from ..data.loader import DataLoader
from ..train.pseudo import generate_pseudo_labels
from ._common import build_seg_dataset, load_seg_checkpoint, val_transform
from .options import pseudo_generation_parse


def main(argv=None):
    args = pseudo_generation_parse().parse_args(argv)
    args.net_mode = "one_channel"
    args.num_classes = 13

    from ._common import apply_model_meta, build_deeplab, resolve_wire
    variables, meta = load_seg_checkpoint(
        os.path.join(args.model_root_path, args.checkpoint_name))
    apply_model_meta(args, meta)
    model, _ = build_deeplab(args, abstract=True)

    dataset = build_seg_dataset(args, val_transform())
    # multi-host runs partition the dataset (disjoint, no truncation: every
    # image gets a pseudo-label) and each process writes its own slice
    from ..parallel.mesh import host_shard
    loader = DataLoader(dataset, args.batch_size, shuffle=False,
                        drop_last=False, shard=host_shard(),
                        shard_lockstep=False)

    from ._common import maybe_data_parallel
    mesh, variables = maybe_data_parallel(args, variables, args.batch_size,
                                          "generating")

    save_path = os.path.join(args.root, "pseudo_labels", args.pseudo_type,
                             args.checkpoint_name.replace(".pth", ""))
    n = generate_pseudo_labels(model, variables, loader, save_path=save_path,
                               soft=args.soft, flip=args.flip,
                               max_steps=args.max_steps,
                               native_encode=getattr(args, "native_encode",
                                                     False),
                               wire=resolve_wire(args),
                               pad_to_batch=args.batch_size, mesh=mesh)
    print(f"wrote pseudo labels for {n} images to {save_path}")


if __name__ == "__main__":
    main()
