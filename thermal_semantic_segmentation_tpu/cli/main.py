"""GAN translation training entry point (reference main.py / main_gan.py).

``-cycle true`` (default) trains the full CycleGAN (2 generators, 2
discriminators, cycle losses — main.py/train.py); ``-cycle false`` trains the
one-direction s2t GAN (main_gan.py/train_gan.py). Optional contour (Canny) and
semantic-consistency losses mirror the reference flags.

Usage: python -m thermal_semantic_segmentation_tpu.cli.main [flags]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_checkpoint, save_checkpoint
from ..data import transforms as T
from ..data.cityscapes import Cityscapes
from ..data.freiburg import Freiburg
from ..data.loader import DataLoader
from ..parallel.mesh import host_shard
from ..data.simple import FlirTrain, Kitti
from ..models.factory import (deeplabv2_resnet101, deeplabv2_resnet101_thermal,
                              init_gan_net, patchgan, unet_256)
from ..ops.image_pool import ImagePool
from ..train.gan import (GanTrainState, create_gan_state,
                         make_fused_gan_step, make_gan_steps)
from ..utils.meters import AverageMeter, ProgressMeter
from .options import train_parse


def _gan_transform(normalize):
    mean = tuple(normalize)
    return T.Compose([
        T.RandomResizedCrop(size=(256, 512), ratio=(1.5, 8 / 3.), scale=(0.5, 1.0)),
        T.RandomHorizontalFlip(),
        T.ToArray(),
        T.Normalize(mean, mean),
    ])


def build_gan_datasets(args):
    src_tf = _gan_transform(args.normalize)
    tgt_tf = _gan_transform((0.5,))
    if args.source_dataset == "Cityscapes":
        source = Cityscapes(args.source_root, transforms=src_tf)
    elif args.source_dataset == "freiburg_rgb":
        source = Freiburg(args.freiburg_root, "train", "RGB", transforms=src_tf,
                          with_label=True, grayscale=args.grayscale,
                          native_decode=getattr(args, "native_decode", False))
    elif args.source_dataset == "kitti":
        source = Kitti(args.kitti_root, src_tf, grayscale=args.grayscale)
    else:
        raise ValueError("source dataset does not exist.")
    if args.target_dataset == "flir":
        target = FlirTrain(args.flir_root, tgt_tf)
    elif args.target_dataset == "freiburg_ir":
        target = Freiburg(args.freiburg_root, "train", "IR", transforms=tgt_tf,
                          with_label=False,
                          native_decode=getattr(args, "native_decode", False))
    else:
        raise ValueError("target dataset does not exist.")
    return source, target


def gan_main(args, shutdown=None):
    from ..utils.preempt import NullShutdown, cross_process
    shutdown = cross_process(
        shutdown if shutdown is not None else NullShutdown())
    key = jax.random.key(args.seed)
    source, target = build_gan_datasets(args)
    src_loader = DataLoader(source, args.batch_size, shuffle=True,
                            drop_last=True, seed=args.seed, shard=host_shard())
    tgt_loader = DataLoader(target, args.batch_size, shuffle=True,
                            drop_last=True, seed=args.seed + 1,
                            shard=host_shard())

    s_nc, t_nc = args.s2t_input_nc, args.t2s_input_nc
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    ngf = getattr(args, 'ngf', 64)
    g_s2t = unet_256(ngf=ngf, input_nc=s_nc, output_nc=t_nc, dtype=dtype)
    d_t = patchgan(input_nc=t_nc, dtype=dtype)
    nets = {"g": {"s2t": g_s2t}, "d": {"t": d_t}}
    g_vars = {"s2t": init_gan_net(g_s2t, key, (1, 256, 512, s_nc))}
    d_vars = {"t": init_gan_net(d_t, key, (1, 256, 512, t_nc))}
    if args.cycle:
        g_t2s = unet_256(ngf=ngf, input_nc=t_nc, output_nc=s_nc, dtype=dtype)
        d_s = patchgan(input_nc=s_nc, dtype=dtype)
        nets["g"]["t2s"], nets["d"]["s"] = g_t2s, d_s
        g_vars["t2s"] = init_gan_net(g_t2s, key, (1, 256, 512, t_nc))
        d_vars["s"] = init_gan_net(d_s, key, (1, 256, 512, s_nc))

    sem_apply = sem_vars = None
    if args.sem_loss and getattr(args, "sem_mode", "legacy") == "module2":
        # frozen sem nets from this repo's OWN seg trainer (module2 head):
        # each checkpoint's meta is authoritative for layers/classes/channels
        # (the same rule segmentation_evaluate uses), inputs ride the data
        # pipeline's [0,1] scale. This is the native analogue of the
        # reference's zoo-pretrained legacy nets — the gates pretrain these
        # through segmentation_train on their synthetic trees.
        from ..models.deeplab import create_deeplab
        from ._common import load_seg_checkpoint
        sem_apply, sem_vars = {}, {}
        for name, nc_default, ckpt_flag in (
                ("s", 3, args.sem_checkpoint_s),
                ("t", 1, args.sem_checkpoint_t)):
            if not ckpt_flag:
                raise SystemExit("-sem_mode module2 requires both "
                                 "-sem_checkpoint_s and -sem_checkpoint_t "
                                 "(segmentation_train checkpoints)")
            variables, meta = load_seg_checkpoint(ckpt_flag)
            net, _ = create_deeplab(
                key, num_classes=int(meta.get("num_classes", 13)),
                num_channels=int(meta.get("num_channels", nc_default)),
                layers=tuple(int(x) for x in meta.get("layers", (3, 4, 23, 3))),
                dtype=dtype, abstract=True)
            sem_apply[name] = net.apply
            sem_vars[name] = variables
            print(f"loaded frozen module2 sem net '{name}' from {ckpt_flag}")
    elif args.sem_loss:
        # frozen legacy seg nets (main.py:80-81); the reference fetches
        # zoo-pretrained weights — here -sem_checkpoint_s/_t supply them
        # (torch legacy .pth or native), a resumed GAN checkpoint's
        # net_seg_* dicts override, and only as a last resort do they start
        # randomly initialized (which makes the semantic loss meaningless).
        sem_s = deeplabv2_resnet101(num_classes=19, dtype=dtype)
        sem_t = deeplabv2_resnet101_thermal(num_classes=19, dtype=dtype)
        sem_apply = {"s": sem_s.apply, "t": sem_t.apply}
        sem_vars = {}
        for name, net, shape, ckpt_flag in (
                ("s", sem_s, (1, 64, 128, 3), args.sem_checkpoint_s),
                ("t", sem_t, (1, 64, 128, 1), args.sem_checkpoint_t)):
            if ckpt_flag:
                sem_vars[name] = _load_sem_variables(ckpt_flag)
                print(f"loaded frozen sem net '{name}' from {ckpt_flag}")
            else:
                sem_vars[name] = init_gan_net(net, key, shape)

    restart_epoch = 0
    ckpt_path = os.path.join(args.gan_model_root_path, args.checkpoint_name)
    if args.load_model:
        ckpt = _load_gan_checkpoint(ckpt_path)
        restart_epoch = int(ckpt["epoch"])
        g_vars = {k: ckpt["g_vars"][k] for k in g_vars}
        d_vars = {k: ckpt["d_vars"][k] for k in d_vars}
        if args.sem_loss and "sem_vars" in ckpt:
            sem_vars = ckpt["sem_vars"]
        print(f"loading trained model. start from epoch {restart_epoch}.")

    from ..parallel.mesh import make_mesh, replicate, shard_batch
    mesh = make_mesh(batch_size=args.batch_size)
    state = replicate(mesh, create_gan_state(g_vars=g_vars, d_vars=d_vars,
                                             learning_rate=args.lr))
    if sem_vars is not None:
        # Device-resident ONCE: sem_vars rides into the jitted step every
        # iteration, and a host pytree would be re-transferred per step
        # (~244 MB for two ResNet101 nets — measured 3x step slowdown AND a
        # ~250 MB/step host-memory leak through the transfer path: the
        # epoch-7 OOM kill of the first fidelity-on gate run).
        sem_vars = replicate(mesh, sem_vars)
    step_kwargs = dict(
        g_apply={k: m.apply for k, m in nets["g"].items()},
        d_apply={k: m.apply for k, m in nets["d"].items()},
        cycle=args.cycle, with_contour=args.with_contour,
        grayscale_source=args.grayscale,
        canny_rgb_threshold=args.canny_rgb_threshold,
        canny_thermal_threshold=args.canny_thermal_threshold,
        sem_apply=sem_apply,
        sem_norm=getattr(args, "sem_mode", "legacy"))
    host_pool = getattr(args, "host_pool", False)
    if host_pool:
        g_step, d_step = make_gan_steps(**step_kwargs)
        pools = {k: ImagePool(50, seed=args.seed + i)
                 for i, k in enumerate(nets["d"])}
    else:
        fused_step, make_pools = make_fused_gan_step(pool_size=50, **step_kwargs)
        shapes = {"t": (256, 512, t_nc)}
        if args.cycle:
            shapes["s"] = (256, 512, s_nc)
        pools = make_pools(shapes, dtype=dtype, seed=args.seed)

    os.makedirs(args.gan_model_root_path, exist_ok=True)
    # live dashboards (reference train.py:241-260): image panels of
    # real/translated pairs + multi-series loss lines, every log_interval
    # iters. Silently inert when visdom isn't importable/reachable.
    from ..utils.observability import VisdomPlotter
    plotter = VisdomPlotter()
    vis_live = plotter.vis is not None
    loss_dict: dict = {}
    epoch_counter_ratio: list = []

    def _push_panels(reals, fakes):
        # NHWC [-1, 1] -> CHW panels, one image per window like the reference
        for name, arr in {**reals, **fakes}.items():
            img = np.asarray(arr[0], dtype=np.float32).transpose(2, 0, 1)
            plotter.images(img, win=name, title=name)

    print("--------START TRAINING--------")
    for epoch in range(restart_epoch, restart_epoch + args.num_epoch):
        print(f"--------EPOCH {epoch}--------")
        meters = {k: AverageMeter(k, ":3.4f")
                  for k in ("g_s2t", "g_t2s", "d_s", "d_t", "cycle_s", "cycle_t",
                            "con_s2t", "con_t2s",
                            # displayed only when the step emits them
                            *(("sem_s2t", "sem_t2s") if args.sem_loss else ()))}
        n_batches = min(len(src_loader), len(tgt_loader))
        progress = ProgressMeter(n_batches, list(meters.values()),
                                 prefix=f"Epoch: [{epoch}]")
        from ..data.device_pipeline import device_prefetch
        from ._common import resolve_wire
        wire = resolve_wire(args, bf16_compute=args.bf16)

        def merged_batches():
            for s_batch, t_batch in zip(src_loader, tgt_loader):
                m = {"real_s": s_batch["image"], "real_t": t_batch["image"]}
                if args.sem_loss and "label" in s_batch:
                    m["label_s"] = s_batch["label"]
                yield m

        for i, b in enumerate(device_prefetch(
                merged_batches(), mesh, wire=wire)):
            if args.max_steps and i >= args.max_steps:
                break
            if shutdown.requested:
                break
            real_s, real_t = b["real_s"], b["real_t"]
            label_s = b.get("label_s")
            log_now = i % args.log_interval == 0
            if host_pool:
                state, metrics, outs = g_step(state, real_s, real_t, label_s,
                                              sem_vars, with_sem=args.sem_loss)
                reals = {"t": real_t}
                fakes = {"t": jnp.asarray(pools["t"].query(outs["fake_t"]))}
                if args.cycle:
                    reals["s"] = real_s
                    fakes["s"] = jnp.asarray(pools["s"].query(outs["fake_s"]))
                fakes = shard_batch(mesh, fakes)
                state, d_metrics = d_step(state, reals, fakes)
                all_metrics = {**metrics, **d_metrics}
                img_outs = outs
            else:
                # with_outs is a STATIC jit arg: keep it constant across
                # steps (toggling it per log-step would compile the full
                # fused program twice, ~10 min each over the axon tunnel).
                # The outs are materialized in-graph for the pool anyway;
                # returning them costs nothing until a log step fetches.
                state, pools, all_metrics = fused_step(
                    state, pools, real_s, real_t, label_s, sem_vars,
                    with_sem=args.sem_loss, with_outs=vis_live)
                img_outs = {k[len("out_"):]: all_metrics.pop(k)
                            for k in list(all_metrics)
                            if k.startswith("out_")}
            if log_now:
                vals = {k: float(v) for k, v in all_metrics.items()}
                for k, v in vals.items():
                    if k in meters:
                        meters[k].update(v, real_s.shape[0])
                progress.display(i)
                if vis_live:
                    _push_panels({"real_s": real_s, "real_t": real_t},
                                 img_outs)  # fake_t (+ fake_s when cycle)
                    for k, v in vals.items():
                        if k in meters:
                            loss_dict.setdefault(k, []).append(v)
                    epoch_counter_ratio.append(epoch + i / max(n_batches, 1))
                    plotter.plot_loss(epoch_counter_ratio, loss_dict)

        if shutdown.requested:
            # preempted mid-epoch: write a distinct resumable checkpoint
            # (never clobber the clean per-epoch save) and exit
            path = os.path.join(args.gan_model_root_path,
                                "preempt_" + args.new_checkpoint_name)
            from ._common import primary_host
            if primary_host():
                save_checkpoint(path, {
                    "epoch": epoch - 1,
                    "g_vars": _materialize_gan_vars(state, g_vars, "g"),
                    "d_vars": _materialize_gan_vars(state, d_vars, "d")})
                print(f"[preempt] saved {path} — resume with -load_model true "
                      f"-checkpoint_name preempt_{args.new_checkpoint_name}",
                      flush=True)
            else:
                print(f"[preempt] save delegated to process 0 "
                      f"(rank {jax.process_index()} exiting)", flush=True)
            return state

        from ._common import primary_host
        last = epoch == restart_epoch + args.num_epoch - 1
        if (last or (epoch - restart_epoch + 1) % getattr(
                args, "save_interval", 1) == 0) and primary_host():
            save_checkpoint(
                ckpt_path if args.new_checkpoint_name == args.checkpoint_name
                else os.path.join(args.gan_model_root_path,
                                  args.new_checkpoint_name),
                {"epoch": epoch,
                 "g_vars": _materialize_gan_vars(state, g_vars, "g"),
                 "d_vars": _materialize_gan_vars(state, d_vars, "d")})
    return state


def _load_gan_checkpoint(path: str):
    """Native msgpack GAN checkpoint, or a reference torch .pth with the
    main.py:128-136 / main_gan.py:110-114 key schema (net_g_s2t_state_dict...),
    converted on the fly."""
    try:
        return load_checkpoint(path)
    except Exception:
        from ..core.checkpoint import maybe_load_torch_checkpoint
        from ..models.torch_convert import torch_gan_checkpoint_to_flax
        return torch_gan_checkpoint_to_flax(maybe_load_torch_checkpoint(path))


def _load_sem_variables(path: str):
    """Frozen sem-net weights: native ({'variables': ...} or bare variables)
    or a torch legacy state_dict (.pth, 'backbone.*'/'classifier.*' layout,
    semantic_segmentation_models.py:140-200)."""
    try:
        ckpt = load_checkpoint(path)
        return ckpt.get("variables", ckpt)
    except Exception:
        from ..core.checkpoint import maybe_load_torch_checkpoint
        from ..models.torch_convert import torch_legacy_state_dict_to_flax
        sd = maybe_load_torch_checkpoint(path)
        sd = sd.get("sem_net_state_dict", sd)
        return torch_legacy_state_dict_to_flax(sd)


def _materialize_gan_vars(state: GanTrainState, template, which):
    params = state.g_params if which == "g" else state.d_params
    stats = state.g_stats if which == "g" else state.d_stats
    return {k: {"params": jax.tree.map(np.asarray, params[k]),
                "batch_stats": jax.tree.map(np.asarray, stats[k])}
            for k in template}


def main(argv=None):
    from ..utils.preempt import GracefulShutdown
    with GracefulShutdown() as shutdown:
        gan_main(train_parse().parse_args(argv), shutdown=shutdown)


if __name__ == "__main__":
    main()
