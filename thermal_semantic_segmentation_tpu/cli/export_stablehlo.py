"""Export a segmentation checkpoint as a self-contained StableHLO artifact.

    python -m thermal_semantic_segmentation_tpu.cli.export_stablehlo \
        -checkpoint_name best_256_freiburg_segmentation.pth \
        --out model_ids.stablehlo --batch dynamic --check true

The artifact embeds the weights and the full eval-protocol forward
(align-corners upsample to 256x512 + argmax; segmentation_evaluate.py:39-42)
and runs anywhere via ``jax.export.deserialize(blob).call(images)`` — no
framework code or checkpoint needed at serving time. ``--batch dynamic``
(default) exports a symbolic batch dimension. A ``<out>.json`` sidecar
records the calling convention. See core/stablehlo.py.
"""

from __future__ import annotations

import json
import os


def export_stablehlo_parse():
    from .options import HostConfigParser, _add_roots, str2bool

    parser = HostConfigParser(
        description="export a seg checkpoint to serialized StableHLO")
    parser.add_argument("-checkpoint_name", type=str,
                        default="256_freiburg_segmentation.pth")
    parser.add_argument("-net_mode", type=str, default="one_channel")
    parser.add_argument("-num_classes", type=int, default=13)
    parser.add_argument("--out", type=str, default="",
                        help="artifact path (default: <ckpt-stem>_<output>"
                             ".stablehlo next to the checkpoint)")
    parser.add_argument("--output", type=str, default="ids",
                        choices=["ids", "logits"],
                        help="'ids': uint8 argmax classes (serving payload); "
                             "'logits': float32 upsampled logits")
    parser.add_argument("--batch", type=str, default="dynamic",
                        help="'dynamic' (symbolic batch dim) or a fixed int")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--check", type=str2bool, default=True,
                        help="round-trip the serialized artifact and compare "
                             "against the direct forward on random pixels "
                             "(runs on this host's platform)")
    _add_roots(parser)
    return parser


def main(argv=None):
    from ._common import apply_model_meta, build_deeplab, load_seg_checkpoint
    from ..core.stablehlo import (_default_artifact_name, _self_check,
                                  export_seg_forward, save_exported)

    args = export_stablehlo_parse().parse_args(argv)
    ckpt_path = os.path.join(args.model_root_path, args.checkpoint_name)
    variables, meta = load_seg_checkpoint(ckpt_path)
    apply_model_meta(args, meta)
    model, _ = build_deeplab(args, abstract=True)
    channels = 1 if args.net_mode == "one_channel" else 3
    batch = None if args.batch == "dynamic" else int(args.batch)
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]

    exported = export_seg_forward(
        model, variables, channels=channels, batch=batch,
        output=args.output, platforms=platforms)
    out = args.out or os.path.join(
        args.model_root_path,
        _default_artifact_name(args.checkpoint_name, args.output))
    sidecar = save_exported(exported, out, meta={
        "checkpoint": args.checkpoint_name, "output_kind": args.output,
        "num_classes": int(args.num_classes), "channels": channels})
    print(json.dumps({"artifact": out, **sidecar}))

    if args.check:
        diff = _self_check(exported, channels, (256, 512), batch,
                           model, variables, args.output)
        kind = ("near-tie argmax flips" if args.output == "ids"
                else "max abs logit diff")
        print(f"self-check passed ({kind}: {diff:.3e})")


if __name__ == "__main__":
    main()
