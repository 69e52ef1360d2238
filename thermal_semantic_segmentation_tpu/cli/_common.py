"""Shared CLI plumbing: dataset selection, checkpoint IO, model construction."""

from __future__ import annotations

import os

import jax
import numpy as np

from ..core.checkpoint import load_checkpoint, maybe_load_torch_checkpoint, save_checkpoint
from ..data import transforms as T
from ..data.cityscapes import Cityscapes, CityscapesTranslation
from ..data.freiburg import Freiburg, FreiburgTest, FreiburgTranslationPairs
from ..models.deeplab import create_deeplab
from ..models.torch_convert import torch_state_dict_to_flax


def resolve_wire(args, *, bf16_compute: bool | None = None) -> str | None:
    """Map --wire to a device_prefetch mode, guarding the lossy variant.

    'packed_bf16' truncates float32 leaves to bfloat16 on the wire — only
    transparent when the consuming step computes in bf16 anyway. When the run
    is f32-compute (no --bf16, or an explicit bf16_compute=False), downgrade
    to lossless 'packed' with a warning instead of silently changing
    numerics (the self-train CLI's soft pseudo-labels are the sharp edge)."""
    wire = getattr(args, "wire", "packed")
    if wire == "none":
        return None
    if wire == "packed_bf16":
        bf16 = (bf16_compute if bf16_compute is not None
                else getattr(args, "bf16", False))
        if not bf16:
            import logging
            logging.getLogger(__name__).warning(
                "--wire packed_bf16 requires bf16 compute to be lossless; "
                "this run computes in float32 — using --wire packed instead")
            return "packed"
    return wire


def train_transform():
    """The canonical train aug (segmentation_train.py:89-94)."""
    return T.Compose([
        T.RandomResizedCrop(size=(256, 512), ratio=(1.5, 8 / 3.), scale=(0.5, 1.0)),
        T.RandomHorizontalFlip(),
        T.ToArray(),
    ])


def val_transform():
    """Resize((512, 256)) + ToTensor (segmentation_train.py:96-99)."""
    return T.Compose([T.Resize((512, 256)), T.ToArray()])


def build_seg_dataset(args, transform, *, for_eval: bool = False):
    """Dataset switch matching segmentation_train.py:104-123 /
    segmentation_evaluate.py:99-118."""
    name = args.dataset
    if name == "cityscapes_translation":
        return CityscapesTranslation(args.source_root, transforms=transform)
    if name == "cityscapes":
        return Cityscapes(args.source_root, transforms=transform)
    if name == "freiburg_ir":
        if for_eval:
            return FreiburgTest(args.freiburg_root, "test", "IR",
                                transforms=transform, with_label=True)
        return Freiburg(args.freiburg_root, "train", "IR", transforms=transform,
                        with_label=True,
                        native_decode=getattr(args, "native_decode", False))
    if name == "freiburg_rgb":
        if for_eval:
            return FreiburgTest(args.freiburg_root, "test", "RGB",
                                transforms=transform, with_label=True,
                                grayscale=args.grayscale)
        return Freiburg(args.freiburg_root, "train", "RGB", transforms=transform,
                        grayscale=args.grayscale, with_label=True,
                        native_decode=getattr(args, "native_decode", False))
    if name == "freiburg_translation":
        if for_eval:
            return FreiburgTranslationPairs(
                folder="test_" + args.checkpoint_name.replace("_segmentation.pth", "") + "/",
                transforms=transform,
                root=os.path.join(args.freiburg_root, "translations"))
        return Freiburg(args.freiburg_root, "train", "RGB", transforms=transform,
                        with_label=True, segmentation_mode=True,
                        translation_name=args.translation_name)
    if name == "freiburg_t2s":
        return FreiburgTranslationPairs(
            folder=args.t2s_folder, transforms=transform,
            root=os.path.join(args.freiburg_root, "translations", "t2s"),
            strip_underscore=False)
    raise ValueError("dataset does not exist.")


def build_deeplab(args, *, get_feat: bool = True, head: str = "module2",
                  abstract: bool = False):
    """net_mode switch (segmentation_train.py:147-156).

    ``abstract=True`` returns shape-only variables (no device init) for the
    load-checkpoint paths.
    """
    import jax.numpy as jnp

    if args.net_mode == "one_channel":
        num_channels = 1
    elif args.net_mode == "three_channels":
        num_channels = 3
    else:
        raise ValueError("net mode does not exist.")
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    return create_deeplab(jax.random.key(args.seed), num_classes=args.num_classes,
                          num_channels=num_channels, head=head, dtype=dtype,
                          abstract=abstract,
                          remat=getattr(args, "remat", "none"),
                          layers=getattr(args, "layers", (3, 4, 23, 3)))


def build_generator_from_gan_checkpoint(path: str, generator_type: str, *,
                                        input_nc: int, output_nc: int,
                                        bf16: bool = False):
    """Load ``g_vars[generator_type]`` from a GAN checkpoint and build the
    matching UNet-256. The checkpoint is authoritative for the generator
    width: flax apply validates param shapes against the module config, so a
    non-default ``-ngf`` training run would otherwise be unusable (the
    reference hardcodes 64, translator.py:38).

    Returns (model, variables, ngf). Shared by the offline translator, the
    translation serving kind, and the StableHLO export.
    """
    import jax.numpy as jnp

    from ..models.factory import unet_256

    ckpt = load_checkpoint(path)
    variables = ckpt["g_vars"][generator_type]
    ngf = int(variables["params"]["down0"]["kernel"].shape[-1])
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = unet_256(ngf=ngf, input_nc=input_nc, output_nc=output_nc,
                     dtype=dtype)
    return model, variables, ngf


def load_seg_checkpoint(path: str):
    """Load a seg checkpoint: native msgpack or a reference torch .pth.

    Returns (variables, meta) where meta carries epoch / val_loss / extras.
    """
    if not os.path.exists(path) and jax.process_count() > 1:
        # msgpack writes funnel through process 0 (primary_host), which
        # assumes every rank reads checkpoints off SHARED storage; on pods
        # with host-local disks the file only exists on host 0 and resume
        # dies here on ranks >= 1 — say so instead of an opaque msgpack error
        raise FileNotFoundError(
            f"checkpoint {path!r} not found on process "
            f"{jax.process_index()}. Multi-host runs write msgpack "
            f"checkpoints from process 0 only and require SHARED storage "
            f"(NFS/GCS-fuse) for resume; with host-local disks, copy the "
            f"checkpoint to every host or use orbax sharded checkpoints "
            f"(docs/OPERATIONS.md).")
    try:
        ckpt = load_checkpoint(path)
        variables = ckpt.pop("variables")
        return variables, ckpt
    except Exception:
        ckpt = maybe_load_torch_checkpoint(path)
        sd = ckpt.get("sem_net_state_dict", ckpt)
        variables = torch_state_dict_to_flax(sd)
        meta = {k: v for k, v in ckpt.items() if not k.endswith("state_dict")}
        return variables, meta


def primary_host() -> bool:
    """True on the process that owns shared-filesystem side effects.

    On multi-host runs every process executes the same trainer loop; params
    are replicated, so any process COULD write the checkpoint — but all of
    them writing the same path doubles IO and races readers on network
    filesystems. The CLI layer funnels msgpack checkpoint writes through
    process 0 (orbax sharded checkpoints coordinate internally and must NOT
    be gated). Single-process: always True."""
    return jax.process_index() == 0


def save_seg_checkpoint(path: str, variables, **meta) -> None:
    if not primary_host():
        return
    payload = {"variables": jax.tree.map(np.asarray, variables), **meta}
    save_checkpoint(path, payload)


def model_meta(args) -> dict:
    """Model-architecture metadata persisted alongside seg checkpoints so
    downstream CLIs need not be re-told the backbone config (a mismatched
    --layers otherwise dies as an opaque flax shape error). Numeric-only:
    flax's msgpack cannot round-trip python strings, so net_mode travels
    as its channel count."""
    return {"layers": list(getattr(args, "layers", (3, 4, 23, 3))),
            "num_channels": 1 if getattr(args, "net_mode",
                                         "one_channel") == "one_channel"
            else 3,
            "num_classes": int(getattr(args, "num_classes", 13))}


def apply_model_meta(args, meta) -> None:
    """Adopt architecture keys from checkpoint meta into ``args`` before
    the model is built. The checkpoint is authoritative: its variables ARE
    that architecture, so a differing flag could only fail later with a
    param-tree mismatch. No-op for reference torch checkpoints (no keys)."""
    def as_cmp(v):
        return tuple(v) if isinstance(v, (list, tuple)) else v

    updates = {}
    if "layers" in meta:
        updates["layers"] = tuple(int(x) for x in meta["layers"])
    if "num_channels" in meta:
        updates["net_mode"] = ("one_channel" if int(meta["num_channels"]) == 1
                               else "three_channels")
    if "num_classes" in meta:
        updates["num_classes"] = int(meta["num_classes"])
    for key, new in updates.items():
        old = getattr(args, key, None)
        if old is not None and as_cmp(old) != as_cmp(new):
            print(f"checkpoint meta overrides --{key}: {old} -> {new}")
        setattr(args, key, new)


def maybe_data_parallel(args, variables, batch_size: int, verb: str):
    """(mesh, variables): honor --data_parallel for an offline inference CLI.

    Meshes over THIS process's chips (parallel/mesh.local_data_mesh — no
    cross-host collectives; an indivisible ``batch_size`` shrinks the mesh
    with a warning) and replicates the params onto it. Returns
    ``(None, variables)`` untouched when the flag is off."""
    if not getattr(args, "data_parallel", False):
        return None, variables
    from ..parallel.mesh import local_data_mesh, replicate
    mesh = local_data_mesh(batch_size=batch_size)
    print(f"{verb} data-parallel over {mesh.size} devices")
    return mesh, replicate(mesh, variables)
