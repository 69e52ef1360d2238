"""Multi-device sharding: dp and dp x sp train steps on the simulated mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab
from thermal_semantic_segmentation_tpu.parallel.mesh import (
    image_sharding, label_sharding, make_mesh_2d, replicate)
from thermal_semantic_segmentation_tpu.train.seg import (
    create_seg_state, make_seg_train_step)


def test_dp_sp_mesh_train_step():
    """Full train step with batch sharded over 'data' AND image width sharded
    over 'spatial' — XLA inserts the conv halo exchanges."""
    mesh = make_mesh_2d(spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(64, 128))
    state = replicate(mesh, create_seg_state(model, variables, learning_rate=1e-3))
    step = make_seg_train_step(ignore_index=12, label_hw=(64, 128), base_lr=1e-3)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (4, 64, 128, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 13, (4, 64, 128)))
    image = jax.device_put(image, image_sharding(mesh, spatial=True))
    label = jax.device_put(label, label_sharding(mesh, spatial=True))

    state, loss = step(state, image, label)
    assert np.isfinite(float(loss))


def test_dp_sp_matches_single_device():
    """Sharded and unsharded runs of the same step produce the same loss."""
    model, variables = create_deeplab(jax.random.key(1), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(64, 128))
    host_vars = jax.tree.map(np.asarray, variables)
    step = make_seg_train_step(ignore_index=12, label_hw=(64, 128), base_lr=1e-3)
    rng = np.random.default_rng(1)
    image = rng.uniform(0, 1, (4, 64, 128, 1)).astype(np.float32)
    label = rng.integers(0, 13, (4, 64, 128))

    # single device
    state1 = create_seg_state(model, jax.tree.map(jnp.asarray, host_vars),
                              learning_rate=1e-3)
    _, loss1 = step(state1, jnp.asarray(image), jnp.asarray(label))

    # dp x sp sharded
    mesh = make_mesh_2d(spatial=2)
    state2 = replicate(mesh, create_seg_state(
        model, jax.tree.map(jnp.asarray, host_vars), learning_rate=1e-3))
    im = jax.device_put(jnp.asarray(image), image_sharding(mesh, spatial=True))
    lb = jax.device_put(jnp.asarray(label), label_sharding(mesh, spatial=True))
    _, loss2 = step(state2, im, lb)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)


def test_self_train_step_sharded():
    """Self-training step under batch-sharded dp on the 8-device mesh."""
    import jax.numpy as jnp
    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh, shard_batch
    from thermal_semantic_segmentation_tpu.train.self_train import (
        create_self_train_state, make_self_train_step)

    mesh = make_mesh()
    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(64, 128))
    rng = np.random.default_rng(0)
    state = replicate(mesh, create_self_train_state(
        model, variables, prototypes=rng.standard_normal((13, 256)) * 0.1,
        learning_rate=1e-4))
    step = make_self_train_step(model, num_classes=13, ignore_index=12,
                                base_lr=1e-4, label_hw=(64, 128))
    B = 8
    batch = dict(
        source_image=rng.uniform(0, 1, (B, 64, 128, 1)).astype(np.float32),
        source_label=rng.integers(0, 13, (B, 64, 128)),
        target_image=rng.uniform(0, 1, (B, 64, 128, 1)).astype(np.float32),
        target_image_full=rng.uniform(0, 1, (B, 80, 176, 1)).astype(np.float32),
        target_lp_soft=rng.uniform(0, 1, (B, 13, 64, 128)).astype(np.float32),
        target_lp_hard=rng.integers(0, 13, (B, 64, 128)),
        weak_params={"resized_hw": np.asarray([[96, 160]] * B),
                     "crop": np.asarray([[8, 72, 16, 144]] * B),
                     "flip": np.asarray([True, False] * (B // 2))},
    )
    batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
    state, lp, ls = step(state, **batch)
    assert np.isfinite(float(lp)) and np.isfinite(float(ls))


def test_gan_steps_sharded():
    """CycleGAN g/d steps under batch-sharded dp on the 8-device mesh."""
    import jax.numpy as jnp
    from thermal_semantic_segmentation_tpu.models.factory import (
        init_gan_net, patchgan, unet_32)
    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh, shard_batch
    from thermal_semantic_segmentation_tpu.train.gan import (
        create_gan_state, make_gan_steps)

    mesh = make_mesh()
    key = jax.random.key(0)
    g_s2t = unet_32(ngf=8, output_nc=1)
    g_t2s = unet_32(ngf=8, output_nc=3)
    d_t = patchgan(ndf=8)
    d_s = patchgan(ndf=8)
    g_vars = {"s2t": init_gan_net(g_s2t, key, (1, 32, 64, 3)),
              "t2s": init_gan_net(g_t2s, key, (1, 32, 64, 1))}
    d_vars = {"t": init_gan_net(d_t, key, (1, 32, 64, 1)),
              "s": init_gan_net(d_s, key, (1, 32, 64, 3))}
    state = replicate(mesh, create_gan_state(g_vars=g_vars, d_vars=d_vars,
                                             learning_rate=1e-4))
    g_step, d_step = make_gan_steps(
        g_apply={"s2t": g_s2t.apply, "t2s": g_t2s.apply},
        d_apply={"t": d_t.apply, "s": d_s.apply}, cycle=True)
    rng = np.random.default_rng(0)
    real_s, real_t = shard_batch(mesh, (
        jnp.asarray(rng.uniform(-1, 1, (8, 32, 64, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, (8, 32, 64, 1)).astype(np.float32))))
    state, metrics, outs = g_step(state, real_s, real_t)
    fakes = shard_batch(mesh, {"s": jnp.asarray(np.asarray(outs["fake_s"])),
                               "t": jnp.asarray(np.asarray(outs["fake_t"]))})
    state, d_metrics = d_step(state, {"s": real_s, "t": real_t}, fakes)
    for k, v in {**metrics, **d_metrics}.items():
        assert np.isfinite(float(v)), k


def _stats_leaves(state):
    return jax.tree.map(np.asarray, state.batch_stats)


def test_per_replica_bn_differs_from_sync_on_mesh():
    """bn_mode='per_replica' (shard_map) normalizes with LOCAL batch stats:
    the stored mean matches sync (mean of per-replica means == global mean)
    but the variance lacks the between-replica term, so it must differ."""
    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    model, variables = create_deeplab(jax.random.key(2), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(64, 128))
    host_vars = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(3)
    # per-replica distributions differ strongly -> between-replica variance
    image = np.concatenate([
        rng.uniform(i / 8, i / 8 + 0.1, (1, 64, 128, 1)) for i in range(8)
    ]).astype(np.float32)
    label = rng.integers(0, 13, (8, 64, 128))

    results = {}
    for mode in ("sync", "per_replica"):
        state = replicate(mesh, create_seg_state(
            model, jax.tree.map(jnp.asarray, host_vars), learning_rate=1e-3))
        step = make_seg_train_step(ignore_index=12, label_hw=(64, 128),
                                   base_lr=1e-3, bn_mode=mode, mesh=mesh)
        sharded = shard_batch(mesh, (jnp.asarray(image), jnp.asarray(label)))
        state, loss = step(state, *sharded)
        assert np.isfinite(float(loss))
        assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated
        results[mode] = _stats_leaves(state)

    bn1 = lambda r: r["backbone"]["conv1_bn"] if "conv1_bn" in r.get(
        "backbone", {}) else r["backbone"]["bn1"]
    sync_bn, pr_bn = bn1(results["sync"]), bn1(results["per_replica"])
    np.testing.assert_allclose(pr_bn["mean"], sync_bn["mean"], rtol=1e-4,
                               atol=1e-6)
    # extract the one-step batch-var contribution from the running update
    # (var <- 0.9 * 1.0 + 0.1 * batch_var): sync sees the global batch var,
    # per-replica the mean of within-replica vars -> strictly smaller here
    bv_sync = (sync_bn["var"] - 0.9) / 0.1
    bv_pr = (pr_bn["var"] - 0.9) / 0.1
    assert bv_sync.mean() > 2.0 * bv_pr.mean(), (bv_sync.mean(), bv_pr.mean())


def test_per_replica_bn_single_device_equals_sync():
    """On a 1-device mesh, per-replica and sync BN stats are identical."""
    from jax.sharding import Mesh
    from thermal_semantic_segmentation_tpu.parallel.mesh import shard_batch

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    model, variables = create_deeplab(jax.random.key(4), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(64, 128))
    host_vars = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(5)
    image = jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 13, (2, 64, 128)))

    stats = {}
    for mode in ("sync", "per_replica"):
        state = replicate(mesh, create_seg_state(
            model, jax.tree.map(jnp.asarray, host_vars), learning_rate=1e-3))
        step = make_seg_train_step(ignore_index=12, label_hw=(64, 128),
                                   base_lr=1e-3, bn_mode=mode, mesh=mesh)
        state, _ = step(state, *shard_batch(mesh, (image, label)))
        stats[mode] = _stats_leaves(state)
    a, b = jax.tree.leaves(stats["sync"]), jax.tree.leaves(stats["per_replica"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-7)


def test_grad_accum_composes_with_per_replica_bn():
    """grad_accum microbatching runs inside the shard_map per-replica step:
    each replica scans its LOCAL microbatches, grads pmean after. One step
    must run, produce a finite loss, and keep params replicated."""
    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    model, variables = create_deeplab(jax.random.key(4), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(64, 128))
    state = replicate(mesh, create_seg_state(model, variables,
                                             learning_rate=1e-3))
    step = make_seg_train_step(ignore_index=12, label_hw=(64, 128),
                               base_lr=1e-3, bn_mode="per_replica", mesh=mesh,
                               grad_accum=2)
    rng = np.random.default_rng(5)
    image = rng.uniform(0, 1, (16, 64, 128, 1)).astype(np.float32)
    label = rng.integers(0, 13, (16, 64, 128))
    sharded = shard_batch(mesh, (jnp.asarray(image), jnp.asarray(label)))
    state, loss = step(state, *sharded)
    assert np.isfinite(float(loss))
    assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated
    assert int(state.step) == 1


def test_make_mesh_shrinks_to_batch_divisor():
    """A global batch that can't split over every device must yield a
    smaller working mesh (with a warning), not an opaque XLA sharding
    error from shard_batch (parallel/mesh.py make_mesh batch_size=)."""
    import warnings

    import pytest

    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh, shard_batch)

    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple devices")
    bs = 3 if n == 2 else 2  # any bs with bs % n != 0 triggers the shrink
    expected = max(d for d in range(1, n + 1) if bs % d == 0)
    assert expected < n
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        mesh = make_mesh(batch_size=bs)
    assert mesh.size == expected
    assert any("does not divide" in str(w.message) for w in caught)
    # divisible batches keep the full mesh, silently
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        full = make_mesh(batch_size=2 * n)
    assert full.size == n and not caught
    # the shrunken mesh actually shards the awkward batch
    x = shard_batch(mesh, {"v": np.zeros((bs, 4), np.float32)})
    assert x["v"].shape == (bs, 4)
