"""Profile a jitted step and print the device-time breakdown.

Automates the recipe every perf chapter in docs/PERFORMANCE.md was written
with: run WARMUP + N steps of a chosen step under ``jax.profiler``, parse
the trace, and aggregate device-side events by HLO category and by op —
the numbers that tell you whether you are conv-bound, copy-bound, or
host-bound (the reference has no profiling tooling at all; its closest
counterpart is wall-clock prints in train.py).

    python -m thermal_semantic_segmentation_tpu.cli.profile_step \
        --step seg --batch_size 8 --steps 20

Prints a per-category table plus ONE final JSON line (machine-readable:
total device ms/step and the category split). Works on the real chip and
on CPU (TSS_PLATFORM=cpu) — the trace layout is the same.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict


def _aggregate_trace(logdir: str):
    """Parse the profiler dump: {pid_name: {event_name: total_us}}.

    The trace is Chrome-format JSON (one .trace.json.gz under
    plugins/profile/<run>/): ``M``etadata events name the pids; ``X``
    (complete) events carry per-op durations. Device pids are the ones
    whose name contains '/device:' (TPU and CPU backends both)."""
    paths = glob.glob(os.path.join(logdir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "/device:" in n
                   and "Host" not in n}
    if not device_pids:
        # CPU backend: everything (XLA op events included) rides the single
        # '/host:CPU' pid — aggregate it all and say so
        device_pids = {e["pid"] for e in events if e.get("ph") == "X"}
        print("note: no '/device:' pid in this trace (CPU backend); "
              "aggregating host+device events together")
    # a device pid carries PARALLEL thread rows: 'XLA Ops' (the per-op
    # events) plus per-step/'XLA Modules' umbrella spans that enclose them —
    # summing all rows triple-counts every microsecond. Keep only the op row
    # when it exists (CPU traces have no such split).
    op_tids = {k for k, n in tid_names.items()
               if k[0] in device_pids and n == "XLA Ops"}

    def _keep(e):
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            return False
        return not op_tids or (e["pid"], e.get("tid")) in op_tids

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    for e in events:
        if not _keep(e):
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        per_op[e.get("name", "?")] += dur
        args = e.get("args") or {}
        cat = (args.get("hlo_category") or args.get("tf_op")
               or e.get("cat") or "uncategorized")
        per_cat[str(cat)] += dur
    return per_op, per_cat


def _build(step_kind: str, args):
    """(run_once, sync) for the requested step at the requested shapes."""
    if step_kind not in ("seg", "eval", "gan", "self_train"):
        raise SystemExit(
            f"unknown --step {step_kind!r} (seg | eval | gan | self_train)")

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    hw = tuple(args.image_size)
    if step_kind == "seg":
        from ..models.deeplab import create_deeplab
        from ..train.seg import create_seg_state, make_seg_train_step

        model, variables = create_deeplab(
            jax.random.key(0), num_classes=args.num_classes, num_channels=1,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32, image_size=hw,
            layers=tuple(args.layers))
        state = create_seg_state(model, variables, learning_rate=1e-4)
        step = make_seg_train_step(ignore_index=12, label_hw=hw, base_lr=1e-4)
        image = jnp.asarray(rng.uniform(0, 1, (args.batch_size, *hw, 1))
                            .astype(np.float32))
        label = jnp.asarray(rng.integers(0, args.num_classes,
                                         (args.batch_size, *hw)))
        box = {"state": state}

        def run():
            box["state"], loss = step(box["state"], image, label)
            return loss
        return run
    if step_kind == "eval":
        from ..models.deeplab import create_deeplab
        from ..train.seg import build_seg_eval_step

        model, variables = create_deeplab(
            jax.random.key(0), num_classes=args.num_classes, num_channels=1,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32, image_size=hw,
            layers=tuple(args.layers))
        eval_step = build_seg_eval_step(model, num_classes=args.num_classes,
                                       ignore_index=12, label_hw=hw)
        image = jnp.asarray(rng.uniform(0, 1, (args.batch_size, *hw, 1))
                            .astype(np.float32))
        label = jnp.asarray(rng.integers(0, args.num_classes,
                                         (args.batch_size, *hw)))

        def run():
            hist, loss, _ = eval_step(variables, image, label)
            return loss
        return run
    if step_kind == "gan":
        from ..models.factory import init_gan_net, patchgan, unet_256
        from ..train.gan import create_gan_state, make_fused_gan_step

        key = jax.random.key(0)
        cycle = args.gan_cycle or args.sem_loss
        g = unet_256(ngf=args.ngf, input_nc=3, output_nc=1)
        d = patchgan(ndf=args.ngf)
        g_vars = {"s2t": init_gan_net(g, key, (1, *hw, 3))}
        d_vars = {"t": init_gan_net(d, key, (1, *hw, 1))}
        g_apply, d_apply = {"s2t": g.apply}, {"t": d.apply}
        if cycle:
            g_back = unet_256(ngf=args.ngf, input_nc=1, output_nc=3)
            d_s = patchgan(ndf=args.ngf, input_nc=3)
            g_vars["t2s"] = init_gan_net(g_back, key, (1, *hw, 1))
            d_vars["s"] = init_gan_net(d_s, key, (1, *hw, 3))
            g_apply["t2s"] = g_back.apply
            d_apply["s"] = d_s.apply
        sem_apply = sem_vars = label_s = None
        if args.sem_loss:
            # frozen module2 sem nets, one per domain — the recipe's
            # fidelity configuration (cli/main.py -sem_mode module2)
            from ..models.deeplab import create_deeplab
            sem_apply, sem_vars = {}, {}
            for name, nc in (("s", 3), ("t", 1)):
                net, variables = create_deeplab(
                    jax.random.key(1), num_classes=args.num_classes,
                    num_channels=nc,
                    dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                    image_size=hw, layers=tuple(args.layers))
                sem_apply[name] = net.apply
                sem_vars[name] = variables
            label_s = jnp.asarray(rng.integers(0, args.num_classes,
                                               (args.batch_size, *hw)))
        state = create_gan_state(g_vars=g_vars, d_vars=d_vars,
                                 learning_rate=2e-4)
        step, make_pools = make_fused_gan_step(
            pool_size=50, g_apply=g_apply, d_apply=d_apply, cycle=cycle,
            with_contour=args.with_contour, sem_apply=sem_apply,
            sem_norm="module2")
        pool_shapes = {"t": (*hw, 1)}
        if cycle:
            pool_shapes["s"] = (*hw, 3)
        pools = make_pools(pool_shapes, seed=0)
        real_s = jnp.asarray(rng.uniform(-1, 1, (args.batch_size, *hw, 3))
                             .astype(np.float32))
        real_t = jnp.asarray(rng.uniform(-1, 1, (args.batch_size, *hw, 1))
                             .astype(np.float32))
        box = {"state": state, "pools": pools}

        def run():
            box["state"], box["pools"], metrics = step(
                box["state"], box["pools"], real_s, real_t,
                label_s=label_s, sem_vars=sem_vars,
                with_sem=args.sem_loss)
            return metrics["g_s2t"]
        return run
    if step_kind == "self_train":
        from ..models.deeplab import create_deeplab
        from ..train.self_train import (create_self_train_state,
                                        make_self_train_step)

        model, variables = create_deeplab(
            jax.random.key(0), num_classes=args.num_classes, num_channels=1,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32, image_size=hw,
            layers=tuple(args.layers))
        state = create_self_train_state(
            model, variables,
            prototypes=rng.standard_normal((args.num_classes, 256)) * 0.1,
            learning_rate=1e-5)
        step = make_self_train_step(model, num_classes=args.num_classes,
                                    ignore_index=12, base_lr=1e-5,
                                    train_thred=0.3, label_hw=hw)
        b = args.batch_size
        full_hw = (hw[0] + 8, hw[1] + 24)
        batch = dict(
            source_image=jnp.asarray(rng.uniform(0, 1, (b, *hw, 1))
                                     .astype(np.float32)),
            source_label=jnp.asarray(rng.integers(0, args.num_classes,
                                                  (b, *hw))),
            target_image=jnp.asarray(rng.uniform(0, 1, (b, *hw, 1))
                                     .astype(np.float32)),
            target_image_full=jnp.asarray(
                rng.uniform(0, 1, (b, *full_hw, 1)).astype(np.float32)),
            target_lp_soft=jnp.asarray(
                rng.uniform(0, 1, (b, args.num_classes, *hw))
                .astype(np.float32)),
            target_lp_hard=jnp.asarray(rng.integers(0, args.num_classes,
                                                    (b, *hw))),
            weak_params={
                "resized_hw": jnp.asarray([[hw[0] + 4, hw[1] + 12]] * b),
                "crop": jnp.asarray([[2, 2 + hw[0], 4, 4 + hw[1]]] * b),
                "flip": jnp.asarray(([True, False] * b)[:b])},
        )
        box = {"state": state}

        def run():
            box["state"], lp, ls = step(box["state"], **batch)
            return lp
        return run
    raise SystemExit(
        f"unknown --step {step_kind!r} (seg | eval | gan | self_train)")


def profile_parse():
    import argparse

    from .options import str2bool

    p = argparse.ArgumentParser(description="profile a jitted step")
    p.add_argument("--step", type=str, default="seg",
                   choices=["seg", "eval", "gan", "self_train"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--image_size", type=int, nargs=2, default=[256, 512])
    p.add_argument("--layers", type=lambda s: tuple(
        int(x) for x in s.split(",")), default=(3, 4, 23, 3))
    p.add_argument("--num_classes", type=int, default=13)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--gan_cycle", type=str2bool, default=False,
                   help="profile the full CycleGAN step (both generator "
                        "directions + both discriminators) instead of the "
                        "one-direction step")
    p.add_argument("--with_contour", type=str2bool, default=False,
                   help="add the differentiable-canny contour loss to the "
                        "profiled GAN step (the recipe's fidelity config)")
    p.add_argument("--sem_loss", type=str2bool, default=False,
                   help="add the semantic-consistency loss with frozen "
                        "module2 sem nets at --layers (implies --gan_cycle); "
                        "the recipe's fidelity config")
    p.add_argument("--bf16", type=str2bool, default=True)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--top", type=int, default=15,
                   help="rows in the per-op table")
    p.add_argument("--logdir", type=str, default="",
                   help="keep the raw trace here (default: temp dir, "
                        "deleted; point TensorBoard at it to drill in)")
    return p


def main(argv=None):
    args = profile_parse().parse_args(argv)

    import time

    run = _build(args.step, args)
    for _ in range(args.warmup):
        loss = run()
    float(loss)  # host fetch: the only trustworthy sync over axon

    logdir = args.logdir or tempfile.mkdtemp(prefix="tss_profile_")
    import jax
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = run()
    final = float(loss)  # sync
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    per_op, per_cat = _aggregate_trace(logdir)
    total_us = sum(per_cat.values())
    print(f"\n{args.step} step x{args.steps} @ batch {args.batch_size} "
          f"{tuple(args.image_size)}: wall {wall * 1e3 / args.steps:.2f} "
          f"ms/step, device {total_us / 1e3 / args.steps:.2f} ms/step "
          f"(loss={final:.4f})\n")
    print(f"{'category':<40} {'ms/step':>10} {'share':>7}")
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat[:40]:<40} {us / 1e3 / args.steps:>10.3f} "
              f"{us / max(total_us, 1e-9):>6.1%}")
    print(f"\ntop {args.top} ops:")
    for op, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {us / 1e3 / args.steps:>8.3f} ms  {op[:100]}")
    if args.logdir:
        print(f"\nraw trace kept at {logdir} (open with TensorBoard)")
    print(json.dumps({
        "step": args.step, "batch_size": args.batch_size,
        "wall_ms_per_step": round(wall * 1e3 / args.steps, 3),
        "device_ms_per_step": round(total_us / 1e3 / args.steps, 3),
        "categories_ms_per_step": {
            k: round(v / 1e3 / args.steps, 3)
            for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])},
    }))


if __name__ == "__main__":
    main()
