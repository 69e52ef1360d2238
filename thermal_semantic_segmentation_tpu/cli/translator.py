"""Offline dataset translation (reference translator.py:15-68).

Loads a trained generator from a GAN checkpoint, translates every image of the
chosen dataset, de-normalizes, resizes to ``save_image_size`` and writes the
image next to the dataset under the translation folder name. (The reference
file is truncated — its loop creates directories but never calls ``.save()``,
translator.py:60-68; this implementation completes the capability.)

Usage: python -m thermal_semantic_segmentation_tpu.cli.translator [flags]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..data import transforms as T
from ..data.cityscapes import Cityscapes
from ..data.freiburg import Freiburg
from ..data.loader import DataLoader
from ..ops.batching import pad_batch_dicts
from .options import translation_parse


def translate(args):
    # UNet-256 needs dims divisible by 2^8: translate at the canonical 256x512
    # (the truncated reference translator feeds raw 700x320 images, which
    # cannot pass its own U-Net's skip concats), then resize to save size.
    tf = T.Compose([T.Resize((512, 256)), T.ToArray(),
                    T.Normalize(tuple(args.normalize), tuple(args.normalize))])
    if args.dataset == "Cityscapes":
        dataset = Cityscapes(args.source_root, transforms=tf, train_mode=False)
    elif args.dataset == "freiburg_rgb":
        dataset = Freiburg(args.freiburg_root, "train", "RGB", transforms=tf,
                           with_label=False, grayscale=args.grayscale,
                           translation_mode=True)
    else:
        raise ValueError("dataset does not exist.")

    # multi-host runs partition the dataset (disjoint, no truncation: every
    # frame gets translated) and each process writes its own slice
    from ..parallel.mesh import host_shard
    loader = DataLoader(dataset, args.batch_size, shuffle=False,
                        drop_last=False, shard=host_shard(),
                        shard_lockstep=False)

    from ._common import build_generator_from_gan_checkpoint
    model, variables, _ = build_generator_from_gan_checkpoint(
        os.path.join(args.gan_model_root_path, args.checkpoint_name),
        "s2t" if args.generator_type == "s2t" else "t2s",
        input_nc=args.input_nc, output_nc=args.output_nc,
        bf16=bool(getattr(args, "bf16", False)))

    @jax.jit
    def run(variables, image):
        return model.apply(variables, image, train=False, mutable=False)

    use_native = False
    if getattr(args, "native_encode", False):
        from ..data import native_loader as nl
        use_native = nl.available()

    denorm = np.asarray(args.denormalize, np.float32)
    save_wh = (args.save_image_size[1], args.save_image_size[0])
    from ..data.device_pipeline import device_prefetch
    from ._common import resolve_wire

    def write_batch(fake, out_paths):
        if use_native:
            # one C++ call: PIL-equivalent BICUBIC resize + encode, threaded
            from ..data import native_loader as nl
            nl.encode_batch(out_paths, fake, resize_wh=save_wh)
            return
        for k, out_path in enumerate(out_paths):
            arr = fake[k].squeeze(-1) if fake.shape[-1] == 1 else fake[k]
            img = Image.fromarray(arr)
            img = img.resize(save_wh, Image.BICUBIC)
            img.save(out_path)

    # encode/save off-thread so the next device batch overlaps host PNG
    # work (SURVEY §7: overlap device compute with async host writes);
    # in-flight futures are bounded so decoded batches don't pile up in RAM
    from ._common import maybe_data_parallel
    mesh, variables = maybe_data_parallel(args, variables, args.batch_size,
                                          "translating")

    # pad the tail batch on HOST so the jitted generator keeps ONE compiled
    # shape (and a sharded transfer ships one shape); only real rows written
    padded = pad_batch_dicts(iter(loader), args.batch_size, {"image": 0.0},
                             keep=("img_path",))

    import concurrent.futures as cf
    pool = cf.ThreadPoolExecutor(max_workers=2)
    futures = []
    for batch in device_prefetch(padded, mesh, wire=resolve_wire(args)):
        # datasets in translation mode return the destination path per image
        paths = batch.get("img_path")
        image = jnp.asarray(batch["image"])
        real_bs = batch["real_bs"]
        fake = np.asarray(run(variables, image))[:real_bs]
        fake = np.clip((fake * denorm + denorm) * 255.0, 0, 255).astype(np.uint8)
        out_paths = []
        for k in range(fake.shape[0]):
            out_path = paths[k]
            if args.translation_name_suffix:
                base, ext = os.path.splitext(out_path)
                out_path = f"{base}_{args.translation_name_suffix}{ext}"
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            out_paths.append(out_path)
        futures.append(pool.submit(write_batch, fake, out_paths))
        while len(futures) > 4:
            futures.pop(0).result()  # re-raise write errors promptly
    for f in futures:
        f.result()
    pool.shutdown()
    print("translation complete.")


def main(argv=None):
    translate(translation_parse().parse_args(argv))


if __name__ == "__main__":
    main()
