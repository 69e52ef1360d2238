"""REAL multi-process data parallelism: 2 jax.distributed processes x 2 CPU
devices, gloo collectives standing in for the DCN fabric between TPU hosts.

The reference is strictly single-device (SURVEY.md §5); multi-host is a new
first-class capability here, and THIS is the test that runs it with actual
separate processes rather than a simulated in-process mesh: each worker holds
only its host_shard() slice of every global batch, the feeds assemble the
global batch via jax.make_array_from_process_local_data
(parallel.mesh.put_sharded), and 3 train steps + an eval confmat must
reproduce the single-process oracle on the same global batches.
"""

import importlib.util
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(__file__)


def _load_worker_module():
    spec = importlib.util.spec_from_file_location(
        "_multihost_worker", os.path.join(_HERE, "_multihost_worker.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, nproc=2, timeout=1800):
    port = _free_port()
    env = dict(os.environ)
    # the worker configures its own jax (2 CPU devices, gloo); the pytest
    # conftest's 8-device XLA_FLAGS would fight jax_num_cpu_devices
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(_HERE), env.get("PYTHONPATH", "")] if p)
    script = os.path.join(_HERE, "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), str(nproc), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return [np.load(os.path.join(tmp_path, f"worker{i}.npz"))
            for i in range(nproc)]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    """ONE 2-process gloo run shared by every test in this module: the
    worker covers seg training, sharded eval, the checkpoint funnel,
    shutdown agreement, prototype merging and the self-train step in a
    single distributed bring-up (each extra bring-up costs ~a minute of
    compile on this 1-core host). In-worker assertion failures surface here
    as a non-zero worker exit."""
    tmp_path = tmp_path_factory.mktemp("multihost")
    return _run_workers(tmp_path)


@pytest.mark.slow
def test_two_process_dp_matches_single_process(worker_results):
    w = _load_worker_module()
    results = worker_results

    # oracle: same model/init/steps, single process, same GLOBAL batches
    import jax

    from thermal_semantic_segmentation_tpu.data.device_pipeline import (
        device_prefetch)
    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch)

    mesh = make_mesh(jax.devices()[:4], batch_size=w.GLOBAL_BATCH)
    _, state, train_step, eval_step = w.make_model_and_steps()
    state = replicate(mesh, state)
    losses, sums = [], []
    for i, (image, label) in enumerate(w.global_batches()):
        if i == w.STEPS - 1:
            batch = next(iter(device_prefetch(
                iter([{"image": image, "label": label}]), mesh, wire="packed")))
        else:
            batch = shard_batch(mesh, {"image": image, "label": label})
        sums.append(float(jax.jit(lambda b: b["image"].sum()
                                  + b["label"].sum())(batch)))
        state, loss = train_step(state, batch["image"], batch["label"])
        losses.append(float(loss))
    image, label = next(w.global_batches())
    batch = shard_batch(mesh, {"image": image, "label": label})
    hist, eval_loss, _ = eval_step(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], batch["label"])
    hist = np.asarray(hist)
    params = w.param_vector(state.params)

    for r in results:
        # the assembled global batch is bit-identical (checksum), so a
        # mis-scoped device_put (local shard read as the global value)
        # cannot hide behind training tolerances
        np.testing.assert_allclose(r["img_sums"], np.asarray(sums), rtol=1e-6)
        np.testing.assert_allclose(r["losses"], np.asarray(losses),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(r["eval_loss"], float(eval_loss),
                                   rtol=2e-4, atol=1e-5)
        # integer confusion matrix: identical up to logit near-ties from
        # cross-process reduction order (fresh random net -> allow a whisker)
        assert r["hist"].sum() == hist.sum()
        assert np.abs(r["hist"] - hist).sum() <= 0.001 * hist.sum()
        # Adam's normalized update is lr*sign(grad-noise) for params whose
        # gradient sits at reduction-order noise level, so a handful of
        # elements may legitimately differ by up to steps*lr between any two
        # reduction orders (measured: 73 of 30.5M at <= 1.1e-3 after 3 steps
        # of lr 1e-3). Bound by that envelope; assembly bugs (wrong samples
        # in the global batch) are caught EXACTLY by the checksums above.
        diff = np.abs(r["param_vec"] - params)
        assert diff.max() <= 4e-3, diff.max()
        assert np.mean(diff > 2e-4) < 1e-5, np.mean(diff > 2e-4)
    # both workers hold the SAME replicated state (no cross-host divergence)
    np.testing.assert_array_equal(results[0]["param_vec"],
                                  results[1]["param_vec"])


@pytest.mark.slow
def test_sharded_eval_reduces_across_processes(worker_results):
    """seg_validate(reduce_processes=True) over disjoint ragged per-process
    slices returns the single-process global scores on EVERY rank — the
    confusion matrix is integer-additive, so mIoU/class IoUs match exactly
    (eval/validate.py + ops/confmat.py; VERDICT r4 #3a)."""
    w = _load_worker_module()
    results = worker_results

    from thermal_semantic_segmentation_tpu.eval.validate import seg_validate

    model0, state0, _, _ = w.make_model_and_steps()
    variables0 = {"params": state0.params, "batch_stats": state0.batch_stats}
    mean_iu, val_loss, cls_iu = seg_validate(
        model0, variables0, w.eval_loader(list(w.eval_images())),
        num_classes=w.NUM_CLASSES, ignore_index=w.IGNORE, label_hw=w.HW,
        pad_to_batch=w.EVAL_BATCH)
    cls = np.asarray([cls_iu[k] for k in sorted(cls_iu)], np.float64)
    for r in results:
        # histogram-derived scores: exact (integer counts, same forwards)
        np.testing.assert_array_equal(r["seval_mean_iu"], mean_iu)
        np.testing.assert_array_equal(r["seval_cls"], cls)
        # CE sums reduce in a different order across processes
        np.testing.assert_allclose(r["seval_val_loss"], val_loss, rtol=1e-5)


@pytest.mark.slow
def test_checkpoint_funnel_and_shutdown_agreement(worker_results):
    """Process 0 alone writes msgpack checkpoints; every rank restores the
    same state; a missing checkpoint on a non-primary rank raises the
    shared-storage error; and one rank's shutdown signal stops all ranks
    (cli/_common.primary_host, utils/preempt.cross_process; VERDICT r4 #3b
    + ADVICE r4 medium). The assertions run inside the workers — here we
    check they all reached the end."""
    for r in worker_results:
        assert r["funnel_ok"]
        assert r["shutdown_ok"]
        assert r["proto_ok"]


@pytest.mark.slow
def test_orbax_sharded_checkpoint_across_processes(worker_results):
    """save_sharded/load_sharded round-trips a mixed replicated +
    batch-sharded payload over the process-spanning mesh with exact values
    and identical shardings (core/checkpoint.py; the dryrun only certifies
    the single-process mesh). Assertions run inside the workers."""
    for r in worker_results:
        assert r["orbax_ok"]


@pytest.mark.slow
def test_self_train_step_two_process_parity(worker_results):
    """The full self-training update (EMA teacher, full2weak, prototype
    rectification, RCE, moving prototypes) over a process-spanning mesh
    matches the single-process oracle on the same global batches
    (train/self_train.py; VERDICT r4 #3c)."""
    w = _load_worker_module()
    results = worker_results

    import jax

    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch)

    mesh = make_mesh(jax.devices()[:4], batch_size=w.GLOBAL_BATCH)
    _, st_state, st_step = w.make_selftrain_and_steps()
    st_state = replicate(mesh, st_state)
    lps, lss = [], []
    for gb in w.st_global_batches():
        batch = shard_batch(mesh, gb)
        st_state, lp, ls = st_step(st_state, **batch)
        lps.append(float(lp))
        lss.append(float(ls))
    params = w.param_vector(st_state.params)
    protos = np.asarray(st_state.prototypes)

    for r in results:
        np.testing.assert_allclose(r["st_lp"], np.asarray(lps),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(r["st_ls"], np.asarray(lss),
                                   rtol=2e-4, atol=1e-5)
        # same Adam sign-noise envelope as the seg test above
        diff = np.abs(r["st_param_vec"] - params)
        assert diff.max() <= 4e-3, diff.max()
        assert np.mean(diff > 2e-4) < 1e-5, np.mean(diff > 2e-4)
        np.testing.assert_allclose(r["st_protos"], protos,
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(results[0]["st_param_vec"],
                                  results[1]["st_param_vec"])


@pytest.mark.slow
def test_sharded_distance_eval_reduces_across_processes(worker_results):
    """evaluate_distance(reduce_processes=True) over disjoint ragged batch
    slices returns the single-process global L1/SSIM/per-class scores on
    every rank (eval/distance.py — same reduction pattern as seg_validate)."""
    w = _load_worker_module()
    results = worker_results

    from thermal_semantic_segmentation_tpu.eval.distance import (
        evaluate_distance)

    l1, s, cls = evaluate_distance(w.dist_batches(), wire="packed",
                                   num_classes=w.NUM_CLASSES)
    for r in results:
        np.testing.assert_allclose(r["dist_l1"], l1, rtol=1e-6)
        np.testing.assert_allclose(r["dist_ssim"], s, rtol=1e-6)
        np.testing.assert_allclose(r["dist_cls"], np.asarray(cls, np.float64),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_fused_gan_step_two_process_parity(worker_results):
    """The fused CycleGAN G+pool+D step over a process-spanning mesh matches
    the single-process oracle on the same global batches (train/gan.py) —
    the last multi-host step-kind without cross-process coverage."""
    w = _load_worker_module()
    results = worker_results

    import jax

    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch)

    mesh = make_mesh(jax.devices()[:4], batch_size=w.GLOBAL_BATCH)
    gstate, pools, gstep = w.make_gan_and_steps()
    gstate = replicate(mesh, gstate)
    pools = replicate(mesh, pools)
    wants = []
    for real_s, real_t in w.gan_global_batches():
        b = shard_batch(mesh, {"s": real_s, "t": real_t})
        gstate, pools, metrics = gstep(gstate, pools, b["s"], b["t"])
        wants.append({k: float(v) for k, v in metrics.items()})
    want = np.asarray([[m[k] for k in sorted(m)] for m in wants], np.float64)
    params = w.param_vector(gstate.g_params)

    for r in results:
        assert [str(k) for k in r["gan_metric_keys"]] == sorted(wants[0])
        np.testing.assert_allclose(r["gan_metrics"], want, rtol=2e-4,
                                   atol=1e-5)
        # same Adam sign-noise envelope as the seg/self-train tests
        diff = np.abs(r["gan_g_param_vec"] - params)
        assert diff.max() <= 4e-3, diff.max()
        assert np.mean(diff > 2e-4) < 1e-5, np.mean(diff > 2e-4)
        assert int(r["gan_pool_count"]) == int(np.asarray(pools["t"].count))
    np.testing.assert_array_equal(results[0]["gan_g_param_vec"],
                                  results[1]["gan_g_param_vec"])


def test_make_mesh_multihost_batch_check():
    """Per-process batch must divide the per-process device count; the mesh
    never shrinks across processes (unit-level check via a fake device)."""

    class _FakeDev:
        def __init__(self, pid):
            self.process_index = pid

    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh

    devs = [_FakeDev(0), _FakeDev(0), _FakeDev(1), _FakeDev(1)]
    with pytest.raises(ValueError, match="per-process batch"):
        make_mesh(devs, batch_size=3)
