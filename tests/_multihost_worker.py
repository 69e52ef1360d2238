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

    np.savez(f"{outdir}/worker{proc_id}.npz",
             losses=np.asarray(losses), img_sums=np.asarray(img_sums),
             hist=np.asarray(hist), eval_loss=float(eval_loss),
             param_vec=param_vector(state.params))
    print(f"worker {proc_id} done")


if __name__ == "__main__":
    main()
