"""Export native checkpoints back to the reference's torch .pth layouts.

The converters in models/torch_convert.py are bidirectional; this CLI makes
the export direction a one-liner, so checkpoints trained here can be loaded
by the PyTorch reference (or any torch-side serving/analysis tooling):

    python -m thermal_semantic_segmentation_tpu.cli.export_torch \
        --kind seg --src checkpoints/semantic_segmentation/s.pth --dst s_torch.pth
    python -m thermal_semantic_segmentation_tpu.cli.export_torch \
        --kind gan --src checkpoints/g.pth --dst g_torch.pth

Output schemas match the reference savers exactly:
  seg:  {'epoch', 'sem_net_state_dict', 'val_loss'}
        (segmentation_train.py:182-190; self-train extras like
        objective_vectors / highest_mean_iu are carried through, matching
        self_train_main.py:119-140)
  gan:  {'epoch', 'net_g_s2t_state_dict', 'net_g_t2s_state_dict',
         'net_d_t_state_dict', 'net_d_s_state_dict'} (main.py:128-136)
"""

from __future__ import annotations

import argparse


def export_seg(src: str, dst: str) -> dict:
    import numpy as np
    import torch

    from ..core.checkpoint import load_checkpoint
    from ..models.torch_convert import flax_to_torch_state_dict

    ckpt = load_checkpoint(src)
    variables = ckpt.pop("variables")
    # np.array (not asarray): msgpack-loaded leaves can be read-only views,
    # and torch.from_numpy on a non-writable array is undefined behavior
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in flax_to_torch_state_dict(variables).items()}
    payload = {"sem_net_state_dict": sd}
    for key in ("epoch", "val_loss", "highest_mean_iu"):
        if key in ckpt:
            payload[key] = ckpt[key]
    if "objective_vectors" in ckpt:
        payload["objective_vectors"] = np.asarray(ckpt["objective_vectors"])
    torch.save(payload, dst)
    return payload


def export_gan(src: str, dst: str, *, norm: str = "batch",
               num_downs: int = 8) -> dict:
    import numpy as np
    import torch

    from ..core.checkpoint import load_checkpoint
    from ..models.torch_convert import flax_gan_checkpoint_to_torch

    ckpt = load_checkpoint(src)
    payload = flax_gan_checkpoint_to_torch(ckpt, norm=norm,
                                           num_downs=num_downs)
    # np.array (not asarray): msgpack-loaded leaves can be read-only views,
    # and torch.from_numpy on a non-writable array is undefined behavior
    payload = {k: ({kk: torch.from_numpy(np.array(vv))
                    for kk, vv in v.items()} if isinstance(v, dict) else v)
               for k, v in payload.items()}
    torch.save(payload, dst)
    return payload


def main(argv=None):
    parser = argparse.ArgumentParser(description="export to torch .pth")
    parser.add_argument("--kind", choices=["seg", "gan"], required=True)
    parser.add_argument("--src", required=True, help="native checkpoint path")
    parser.add_argument("--dst", required=True, help="output .pth path")
    parser.add_argument("--norm", default="batch",
                        help="GAN norm layer (batch/instance)")
    parser.add_argument("--num_downs", type=int, default=8,
                        help="UNet depth of the GAN generators")
    args = parser.parse_args(argv)
    if args.kind == "seg":
        payload = export_seg(args.src, args.dst)
    else:
        payload = export_gan(args.src, args.dst, norm=args.norm,
                             num_downs=args.num_downs)
    print(f"wrote {args.dst} with keys {sorted(payload)}")


if __name__ == "__main__":
    main()
