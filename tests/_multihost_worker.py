"""Worker for tests/test_multihost.py: one process of a REAL multi-process
``jax.distributed`` data-parallel run (gloo CPU collectives stand in for the
DCN fabric between TPU hosts).

Each process holds 2 CPU devices and its ``host_shard()`` slice of every
global batch — exactly what a host_shard()-sharded DataLoader feeds on a real
multi-host pod — and trains the seg step over the process-spanning mesh.
Run as:  python _multihost_worker.py <proc_id> <nproc> <port> <outdir>

The shared fixtures (model builder, deterministic global batches) live here
so the parent test's single-process oracle runs the EXACT same construction.
"""

import sys

GLOBAL_BATCH = 8
STEPS = 3
HW = (32, 64)
NUM_CLASSES = 13
IGNORE = 12


def global_batches():
    """Deterministic global (image, label) batches, one per train step."""
    import numpy as np
    for i in range(STEPS):
        rng = np.random.default_rng(100 + i)
        image = rng.normal(size=(GLOBAL_BATCH, *HW, 1)).astype(np.float32)
        label = rng.integers(0, NUM_CLASSES, (GLOBAL_BATCH, *HW)).astype(np.int32)
        yield image, label


def make_model_and_steps():
    """Tiny DeepLab + the real train/eval steps (sync BN: the jitted step sees
    the global batch, so multi-host must reproduce single-host exactly)."""
    import jax

    from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab
    from thermal_semantic_segmentation_tpu.train.seg import (
        build_seg_eval_step, create_seg_state, make_seg_train_step)

    model, variables = create_deeplab(
        jax.random.key(0), num_classes=NUM_CLASSES, num_channels=1,
        layers=(1, 1, 1, 1), image_size=HW)
    state = create_seg_state(model, variables, learning_rate=1e-3)
    train_step = make_seg_train_step(ignore_index=IGNORE, label_hw=HW,
                                     base_lr=1e-3)
    eval_step = build_seg_eval_step(model, num_classes=NUM_CLASSES,
                                    ignore_index=IGNORE, label_hw=HW)
    return model, state, train_step, eval_step


def param_vector(params):
    """All param leaves raveled into one vector, in a path-stable order."""
    import numpy as np
    from jax.tree_util import tree_flatten_with_path
    leaves, _ = tree_flatten_with_path(params)
    return np.concatenate([np.asarray(v).ravel()
                           for _, v in sorted(leaves, key=lambda kv: str(kv[0]))])


N_EVAL_IMAGES = 9  # odd on purpose: ragged per-process batch counts
EVAL_BATCH = 2


def eval_images():
    """Deterministic (image, label) pairs for the sharded-eval phase."""
    import numpy as np
    rng = np.random.default_rng(7)
    for _ in range(N_EVAL_IMAGES):
        yield (rng.normal(size=(*HW, 1)).astype(np.float32),
               rng.integers(0, NUM_CLASSES, HW).astype(np.int32))


def eval_loader(items):
    """Chunk (image, label) pairs into batch dicts like a DataLoader yields."""
    import numpy as np
    out = []
    for i in range(0, len(items), EVAL_BATCH):
        chunk = items[i:i + EVAL_BATCH]
        out.append({"image": np.stack([c[0] for c in chunk]),
                    "label": np.stack([c[1] for c in chunk])})
    return out


ST_STEPS = 2


def st_global_batches():
    """Deterministic global self-train batches (the dryrun surface shapes:
    target_image_full bigger than the crop, invertible weak_params)."""
    import numpy as np
    for i in range(ST_STEPS):
        rng = np.random.default_rng(300 + i)
        b = GLOBAL_BATCH
        yield dict(
            source_image=rng.uniform(0, 1, (b, *HW, 1)).astype(np.float32),
            source_label=rng.integers(0, NUM_CLASSES, (b, *HW)).astype(np.int32),
            target_image=rng.uniform(0, 1, (b, *HW, 1)).astype(np.float32),
            target_image_full=rng.uniform(0, 1, (b, 40, 88, 1)).astype(np.float32),
            target_lp_soft=rng.uniform(0, 1, (b, NUM_CLASSES, *HW)).astype(np.float32),
            target_lp_hard=rng.integers(0, NUM_CLASSES, (b, *HW)).astype(np.int32),
            weak_params={
                "resized_hw": np.asarray([[48, 80]] * b),
                "crop": np.asarray([[8, 40, 8, 72]] * b),
                "flip": np.asarray(([True, False] * b)[:b])},
        )


N_DIST_BATCHES = 5  # odd on purpose: ragged per-process batch counts


def dist_batches():
    """Deterministic original/translated/label batches for distance eval."""
    import numpy as np
    out = []
    for i in range(N_DIST_BATCHES):
        rng = np.random.default_rng(700 + i)
        out.append(dict(
            original=rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32),
            translated=rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32),
            label=rng.integers(0, NUM_CLASSES, (2, 16, 16)).astype(np.int32)))
    return out


GAN_STEPS = 2


def gan_global_batches():
    """Deterministic global (real_s, real_t) batches for the GAN phase."""
    import numpy as np
    for i in range(GAN_STEPS):
        rng = np.random.default_rng(500 + i)
        yield (rng.uniform(-1, 1, (GLOBAL_BATCH, *HW, 3)).astype(np.float32),
               rng.uniform(-1, 1, (GLOBAL_BATCH, *HW, 1)).astype(np.float32))


def make_gan_and_steps():
    """Tiny CycleGAN (unet_32 G pair + PatchGAN Ds) with the real fused
    G+pool+D step (train/gan.py). pool_size stays above the total insert
    count so the device pool remains in its deterministic insert regime —
    multi-host must then match single-host exactly, no RNG tolerance."""
    import jax

    from thermal_semantic_segmentation_tpu.models.factory import (
        init_gan_net, patchgan, unet_32)
    from thermal_semantic_segmentation_tpu.train.gan import (
        create_gan_state, make_fused_gan_step)

    key = jax.random.key(0)
    g_s2t = unet_32(ngf=8, output_nc=1)
    g_t2s = unet_32(ngf=8, output_nc=3)
    d_t, d_s = patchgan(ndf=8), patchgan(ndf=8)
    g_vars = {"s2t": init_gan_net(g_s2t, key, (1, *HW, 3)),
              "t2s": init_gan_net(g_t2s, key, (1, *HW, 1))}
    d_vars = {"t": init_gan_net(d_t, key, (1, *HW, 1)),
              "s": init_gan_net(d_s, key, (1, *HW, 3))}
    state = create_gan_state(g_vars=g_vars, d_vars=d_vars, learning_rate=1e-4)
    step, make_pools = make_fused_gan_step(
        pool_size=64,
        g_apply={"s2t": g_s2t.apply, "t2s": g_t2s.apply},
        d_apply={"t": d_t.apply, "s": d_s.apply}, cycle=True)
    pools = make_pools({"t": (*HW, 1), "s": (*HW, 3)}, seed=0)
    return state, pools, step


def make_selftrain_and_steps():
    """Tiny DeepLab + the real self-train step (EMA teacher, full2weak,
    prototype rectification, RCE, moving prototypes) shared by worker and
    single-process oracle."""
    import jax
    import numpy as np

    from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab
    from thermal_semantic_segmentation_tpu.train.self_train import (
        create_self_train_state, make_self_train_step)

    model, variables = create_deeplab(
        jax.random.key(0), num_classes=NUM_CLASSES, num_channels=1,
        layers=(1, 1, 1, 1), image_size=HW)
    protos = np.random.default_rng(9).standard_normal(
        (NUM_CLASSES, 256)).astype(np.float32) * 0.1
    state = create_self_train_state(model, variables, prototypes=protos,
                                    learning_rate=1e-3)
    step = make_self_train_step(model, num_classes=NUM_CLASSES,
                                ignore_index=IGNORE, base_lr=1e-3,
                                train_thred=0.3, label_hw=HW)
    return model, state, step


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", 2)
    # both workers compile the same programs: persistent cache halves the
    # second worker's compile time on this 1-core host (temp+rename writes
    # are concurrency-safe)
    from thermal_semantic_segmentation_tpu.core.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()

    import numpy as np

    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        host_shard, init_distributed, make_mesh, replicate, shard_batch)

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc
    assert host_shard() == (proc_id, nproc)

    # per-process batch 4 over 2 local devices -> global batch 8 over 4 devices
    mesh = make_mesh(batch_size=GLOBAL_BATCH // nproc)
    assert mesh.devices.size == 2 * nproc

    _, state0, train_step, eval_step = make_model_and_steps()
    state = replicate(mesh, state0)

    local = GLOBAL_BATCH // nproc
    sl = slice(proc_id * local, (proc_id + 1) * local)
    losses, img_sums = [], []
    for i, (image, label) in enumerate(global_batches()):
        if i == STEPS - 1:
            # last step rides the packed wire (data/wire.py) instead of the
            # raw shard_batch path: covers PackedFeed's multi-host assembly
            from thermal_semantic_segmentation_tpu.data.device_pipeline import (
                device_prefetch)
            batch = next(iter(device_prefetch(
                iter([{"image": image[sl], "label": label[sl]}]),
                mesh, wire="packed")))
        else:
            batch = shard_batch(mesh, {"image": image[sl], "label": label[sl]})
        # checksum of the ASSEMBLED global batch: catches the device_put
        # mis-scoping failure mode (local shard treated as the global value)
        img_sums.append(float(jax.jit(lambda b: b["image"].sum()
                                      + b["label"].sum())(batch)))
        state, loss = train_step(state, batch["image"], batch["label"])
        losses.append(float(loss))

    image, label = next(global_batches())
    batch = shard_batch(mesh, {"image": image[sl], "label": label[sl]})
    hist, eval_loss, _ = eval_step(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], batch["label"])

    extra = {}
    run_extra_phases(proc_id, nproc, outdir, mesh, extra)

    np.savez(f"{outdir}/worker{proc_id}.npz",
             losses=np.asarray(losses), img_sums=np.asarray(img_sums),
             hist=np.asarray(hist), eval_loss=float(eval_loss),
             param_vec=param_vector(state.params), **extra)
    print(f"worker {proc_id} done")


def run_extra_phases(proc_id, nproc, outdir, mesh, extra):
    """Cross-process coverage beyond the seg train step (VERDICT r4 #3):
    sharded eval reduction, the process-0 checkpoint funnel, shutdown-flag
    agreement, prototype merging, and the full self-train step. Collective
    order is identical on every rank (allgathers/barriers pair up)."""
    import os

    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    # --- sharded eval: disjoint ragged slices, global scores everywhere ---
    from thermal_semantic_segmentation_tpu.eval.validate import seg_validate

    model0, state0, _, _ = make_model_and_steps()
    variables0 = {"params": state0.params, "batch_stats": state0.batch_stats}
    mine = [im for i, im in enumerate(eval_images()) if i % nproc == proc_id]
    mean_iu, val_loss, cls_iu = seg_validate(
        model0, variables0, eval_loader(mine), num_classes=NUM_CLASSES,
        ignore_index=IGNORE, label_hw=HW, pad_to_batch=EVAL_BATCH,
        reduce_processes=True)
    extra["seval_mean_iu"] = float(mean_iu)
    extra["seval_val_loss"] = float(val_loss)
    extra["seval_cls"] = np.asarray(
        [cls_iu[k] for k in sorted(cls_iu)], np.float64)

    # --- checkpoint funnel: only process 0 writes; everyone restores ---
    from thermal_semantic_segmentation_tpu.cli._common import (
        load_seg_checkpoint, primary_host, save_seg_checkpoint)

    assert primary_host() == (proc_id == 0)
    private = os.path.join(outdir, f"private_rank{proc_id}", "gated.pth")
    os.makedirs(os.path.dirname(private), exist_ok=True)
    save_seg_checkpoint(private, jax.device_get(variables0), epoch=3)
    if proc_id != 0:
        # the gate must have skipped the write entirely on this rank
        assert not os.path.exists(private), "non-primary rank wrote a ckpt"
        # and a missing checkpoint at resume fails with the shared-storage
        # message, not an opaque msgpack error
        try:
            load_seg_checkpoint(os.path.join(outdir, "does_not_exist.pth"))
            raise AssertionError("missing ckpt did not raise")
        except FileNotFoundError as e:
            assert "SHARED storage" in str(e), str(e)
    else:
        assert os.path.exists(private)
    shared = os.path.join(outdir, "funnel.pth")
    save_seg_checkpoint(shared, jax.device_get(variables0), epoch=3)
    multihost_utils.sync_global_devices("funnel_written")
    restored, meta = load_seg_checkpoint(shared)
    assert int(meta["epoch"]) == 3
    np.testing.assert_array_equal(param_vector(restored["params"]),
                                  param_vector(variables0["params"]))
    extra["funnel_ok"] = True

    # --- shutdown agreement: one rank's SIGTERM stops every rank ---
    from thermal_semantic_segmentation_tpu.utils.preempt import cross_process

    class _Fake:
        requested = False
        signum = None

    fake = _Fake()
    agreed = cross_process(fake)
    assert type(agreed).__name__ == "CrossProcessShutdown"
    assert agreed.requested is False          # nobody signaled yet
    if proc_id == 1:
        fake.requested = True                 # signal lands on rank 1 only
    assert agreed.requested is True           # ...and every rank agrees
    assert agreed.requested is True           # latched: no re-gather needed
    extra["shutdown_ok"] = True

    # --- prototype merge: count-weighted partials == global mean ---
    from thermal_semantic_segmentation_tpu.train.prototypes import (
        merge_process_prototypes)

    vecs = np.random.default_rng(11).standard_normal((10, NUM_CLASSES, 8)
                                                     ).astype(np.float32)
    mine_v = vecs[proc_id::nproc]
    merged, total = merge_process_prototypes(
        mine_v.mean(axis=0), np.full((NUM_CLASSES,), float(len(mine_v)),
                                     np.float32))
    # atol covers near-zero elements where fp32 reduction-order noise
    # (~2e-8 abs) dwarfs any rtol
    np.testing.assert_allclose(merged, vecs.mean(axis=0), rtol=2e-6, atol=1e-6)
    np.testing.assert_array_equal(total, np.full((NUM_CLASSES,), 10.0))
    extra["proto_ok"] = True

    # --- the full self-train step over the process-spanning mesh ---
    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        replicate, shard_batch)

    _, st_state, st_step = make_selftrain_and_steps()
    st_state = replicate(mesh, st_state)
    local = GLOBAL_BATCH // nproc
    sl = slice(proc_id * local, (proc_id + 1) * local)
    lps, lss = [], []
    for gb in st_global_batches():
        batch = shard_batch(mesh, jax.tree.map(lambda a: a[sl], gb))
        st_state, lp, ls = st_step(st_state, **batch)
        lps.append(float(lp))
        lss.append(float(ls))
    extra["st_lp"] = np.asarray(lps)
    extra["st_ls"] = np.asarray(lss)
    extra["st_param_vec"] = param_vector(st_state.params)
    extra["st_protos"] = np.asarray(st_state.prototypes)

    # --- the fused CycleGAN G+pool+D step over the process-spanning mesh ---
    gstate, pools, gstep = make_gan_and_steps()
    gstate = replicate(mesh, gstate)
    pools = replicate(mesh, pools)
    g_metrics = []
    for real_s, real_t in gan_global_batches():
        b = shard_batch(mesh, {"s": real_s[sl], "t": real_t[sl]})
        gstate, pools, metrics = gstep(gstate, pools, b["s"], b["t"])
        g_metrics.append({k: float(v) for k, v in metrics.items()})
    extra["gan_metric_keys"] = np.asarray(sorted(g_metrics[0]))
    extra["gan_metrics"] = np.asarray(
        [[m[k] for k in sorted(m)] for m in g_metrics], np.float64)
    extra["gan_g_param_vec"] = param_vector(gstate.g_params)
    extra["gan_pool_count"] = int(np.asarray(pools["t"].count))

    # --- orbax sharded checkpoint across processes: every process writes
    # only its own shards; the restored tree carries the EXACT process-
    # spanning shardings it was saved with (core/checkpoint.save_sharded /
    # load_sharded — the dryrun only certifies this on a single-process
    # mesh, __graft_entry__ surface 3) ---
    import jax.numpy as jnp

    from thermal_semantic_segmentation_tpu.core.checkpoint import (
        abstract_like, load_sharded, save_sharded)

    img, _ = next(global_batches())
    payload = {
        "params": st_state.params,                      # replicated leaves
        "data": shard_batch(mesh, {"x": img[sl]})["x"],  # batch-sharded leaf
    }
    ck = os.path.join(outdir, "orbax_sharded")          # shared tmp fs
    save_sharded(ck, payload)
    restored = load_sharded(ck, abstract_like(payload))
    mismatched = jax.tree.leaves(jax.tree.map(
        lambda o, r: int(r.sharding != o.sharding), payload, restored))
    assert sum(mismatched) == 0, f"{sum(mismatched)} leaves changed sharding"
    assert not restored["data"].sharding.is_fully_replicated
    # value equality through a jitted global reduction (the arrays are not
    # fully addressable on any one process, so no host-side compare exists)
    diff = jax.jit(lambda a, b: jnp.asarray(
        [jnp.abs(x - y).max() for x, y in
         zip(jax.tree.leaves(a), jax.tree.leaves(b))]).max())(payload, restored)
    assert float(diff) == 0.0, float(diff)
    extra["orbax_ok"] = True

    # --- sharded translation-distance eval: disjoint ragged slices, the
    # L1/SSIM/per-class accumulators reduce across processes
    # (eval/distance.evaluate_distance reduce_processes=True) ---
    from thermal_semantic_segmentation_tpu.eval.distance import (
        evaluate_distance)

    mine_d = [b for i, b in enumerate(dist_batches()) if i % nproc == proc_id]
    d_l1, d_ssim, d_cls = evaluate_distance(
        mine_d, wire="packed", num_classes=NUM_CLASSES, reduce_processes=True)
    extra["dist_l1"] = float(d_l1)
    extra["dist_ssim"] = float(d_ssim)
    extra["dist_cls"] = np.asarray(d_cls, np.float64)


if __name__ == "__main__":
    main()
