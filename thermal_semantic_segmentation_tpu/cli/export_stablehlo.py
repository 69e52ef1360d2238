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
        description="export a seg/generator checkpoint to serialized StableHLO")
    parser.add_argument("--kind", type=str, default="seg",
                        choices=["seg", "generator"],
                        help="'seg': eval-protocol segmenter forward; "
                             "'generator': GAN translator forward "
                             "(normalized image in, tanh image out)")
    parser.add_argument("-checkpoint_name", type=str,
                        default="256_freiburg_segmentation.pth")
    parser.add_argument("-net_mode", type=str, default="one_channel")
    parser.add_argument("-num_classes", type=int, default=13)
    parser.add_argument("-generator_type", type=str, default="s2t",
                        choices=["s2t", "t2s"],
                        help="which generator to export from a GAN ckpt")
    parser.add_argument("-input_nc", type=int, default=3)
    parser.add_argument("-output_nc", type=int, default=1)
    parser.add_argument("--out", type=str, default="",
                        help="artifact path (default: <ckpt-stem>_<output>"
                             ".stablehlo next to the checkpoint)")
    parser.add_argument("--output", type=str, default="ids",
                        choices=["ids", "logits"],
                        help="'ids': uint8 argmax classes (serving payload); "
                             "'logits': float32 upsampled logits")
    parser.add_argument("--batch", type=str, default="dynamic",
                        help="'dynamic' (symbolic batch dim) or a fixed int")
    parser.add_argument("--quantize", type=str, default="",
                        choices=["", "int8"],
                        help="weight-only storage quantization: conv/dense "
                             "kernels become int8 + per-channel scales in "
                             "the artifact (~4x smaller); compute stays "
                             "float — the artifact dequantizes at the top "
                             "of the graph (core/stablehlo.py)")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--check", type=str2bool, default=True,
                        help="round-trip the serialized artifact and compare "
                             "against the direct forward on random pixels "
                             "(runs on this host's platform)")
    _add_roots(parser)
    return parser


def main(argv=None):
    from ..core.stablehlo import (_default_artifact_name, _self_check,
                                  dequantize_variables_np,
                                  export_generator_forward,
                                  export_seg_forward, quantize_variables,
                                  save_exported)

    args = export_stablehlo_parse().parse_args(argv)
    batch = None if args.batch == "dynamic" else int(args.batch)
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    quantize = args.quantize or None

    if args.kind == "seg":
        from ._common import (apply_model_meta, build_deeplab,
                              load_seg_checkpoint)

        ckpt_path = os.path.join(args.model_root_path, args.checkpoint_name)
        variables, meta = load_seg_checkpoint(ckpt_path)
        apply_model_meta(args, meta)
        model, _ = build_deeplab(args, abstract=True)
        channels = 1 if args.net_mode == "one_channel" else 3
        exported = export_seg_forward(
            model, variables, channels=channels, batch=batch,
            output=args.output, quantize=quantize, platforms=platforms)
        extra = {"output_kind": args.output,
                 "num_classes": int(args.num_classes), "channels": channels}
        stem = args.output + ("_int8" if quantize else "")
    else:
        from ._common import build_generator_from_gan_checkpoint

        model, variables, ngf = build_generator_from_gan_checkpoint(
            os.path.join(args.gan_model_root_path, args.checkpoint_name),
            args.generator_type, input_nc=args.input_nc,
            output_nc=args.output_nc, bf16=bool(getattr(args, "bf16", False)))
        channels = args.input_nc
        exported = export_generator_forward(
            model, variables, channels=channels, batch=batch,
            quantize=quantize, platforms=platforms)
        extra = {"output_kind": "translation",
                 "generator_type": args.generator_type, "ngf": ngf,
                 "channels": channels, "output_nc": args.output_nc}
        stem = f"g_{args.generator_type}" + ("_int8" if quantize else "")

    out = args.out or os.path.join(
        args.model_root_path if args.kind == "seg"
        else args.gan_model_root_path,
        _default_artifact_name(args.checkpoint_name, stem))
    sidecar = save_exported(exported, out, meta={
        "checkpoint": args.checkpoint_name, **extra})
    print(json.dumps({"artifact": out, **sidecar}))

    if args.check:
        from ..core.stablehlo import load_exported

        output = args.output if args.kind == "seg" else "image"
        # bf16 compute re-folds with ~2^-8 relative precision on the tanh
        # range; f32 exports must agree far tighter
        tol = 1e-2 if getattr(args, "bf16", False) else 1e-4
        check_vars = variables
        to_check = exported
        if quantize:
            # the artifact's contract is the DEQUANTIZED model: check the
            # on-disk container round trip against it (quantization drift
            # vs fp32 is the user's accuracy tradeoff, not an export defect)
            qtree, scales, _ = quantize_variables(variables)
            check_vars = dequantize_variables_np(qtree, scales)
            to_check = load_exported(out)
        diff = _self_check(to_check, channels, (256, 512), batch,
                           model, check_vars, output, tol=tol)
        kind = {"ids": "near-tie argmax flips",
                "logits": "max abs logit diff",
                "image": "max abs image diff"}[output]
        print(f"self-check passed ({kind}: {diff:.3e})")


if __name__ == "__main__":
    main()
