"""Class-prototype computation entry point (reference cal_prototype.py).

Saves the (num_classes, 256) prototype array under
<root>/prototypes/prototypes_on_<dataset>_from_<checkpoint> like the reference
(cal_prototype.py:78-82), in msgpack format.

Usage: python -m thermal_semantic_segmentation_tpu.cli.cal_prototype [flags]
"""

from __future__ import annotations

import os

import numpy as np

from ..core.checkpoint import save_checkpoint
from ..data import transforms as T
from ..data.freiburg import Freiburg
from ..data.loader import DataLoader
from ..data.simple import FlirTrain
from ..train.prototypes import calc_prototypes
from ._common import load_seg_checkpoint
from .options import calc_proto_parse


def prototype_path(root: str, dataset: str, checkpoint_name: str) -> str:
    return os.path.join(root, "prototypes",
                        f"prototypes_on_{dataset}_from_{checkpoint_name.replace('.pth', '')}")


def calc_prototype(args):
    tf = T.Compose([T.Resize((512, 256)), T.ToArray()])
    if args.dataset == "flir":
        dataset = FlirTrain(args.flir_root, tf)
    elif args.dataset == "freiburg_ir":
        dataset = Freiburg(args.freiburg_root, "train", "IR", transforms=tf,
                           with_label=False)
    else:
        raise ValueError("target dataset does not exist.")
    # under --distributed each process folds only its own dataset shard
    # (exact partition, no truncation); calc_prototypes count-weight-merges
    # the per-process partials at the end (train/prototypes.py)
    from ..parallel.mesh import host_shard
    loader = DataLoader(dataset, args.batch_size, shuffle=True, drop_last=True,
                        seed=args.seed, shard=host_shard(),
                        shard_lockstep=False)

    from ._common import apply_model_meta, build_deeplab, resolve_wire
    variables, meta = load_seg_checkpoint(
        os.path.join(args.model_root_path, args.checkpoint_name))
    apply_model_meta(args, meta)
    model, _ = build_deeplab(args, abstract=True)

    from ._common import maybe_data_parallel
    mesh, variables = maybe_data_parallel(args, variables, args.batch_size,
                                          "computing prototypes")

    prototypes, counts = calc_prototypes(model, variables, loader,
                                         num_classes=args.num_classes,
                                         epochs=args.epochs,
                                         max_steps=args.max_steps,
                                         wire=resolve_wire(args), mesh=mesh)
    out_path = prototype_path(args.root, args.dataset, args.checkpoint_name)
    from ._common import primary_host
    if primary_host():
        print("saving prototypes......")
        save_checkpoint(out_path, {"objective_vectors": np.asarray(prototypes),
                                   "counts": np.asarray(counts)})
        print(f"saved to {out_path}")
    else:
        print(f"save delegated to process 0 ({out_path})")
    return prototypes


def main(argv=None):
    calc_prototype(calc_proto_parse().parse_args(argv))


if __name__ == "__main__":
    main()
