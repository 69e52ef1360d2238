"""GAN stack tests: canny parity vs reference torch oracle, net shapes,
ImagePool statistics, and a two-step training smoke."""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.models.factory import (
    init_gan_net, patchgan, resnet_6, unet_32, unet_256)
from thermal_semantic_segmentation_tpu.nn.canny import canny_edges
from thermal_semantic_segmentation_tpu.ops.image_pool import ImagePool
from thermal_semantic_segmentation_tpu.train.gan import (
    create_gan_state, gan_to_seg_tensor, make_gan_steps)

torch = pytest.importorskip("torch")


def _load_reference_canny():
    """Import the reference net_canny as an oracle (scipy.signal.gaussian moved
    to scipy.signal.windows in modern scipy; shim it)."""
    import scipy.signal
    import scipy.signal.windows
    if not hasattr(scipy.signal, "gaussian"):
        scipy.signal.gaussian = scipy.signal.windows.gaussian
    spec = importlib.util.spec_from_file_location(
        "_ref_canny", "/root/reference/models/net_canny.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_canny"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("channels,threshold", [(1, 1.0), (3, 2.5)])
def test_canny_matches_reference(channels, threshold):
    """Parity at batch=1 only: the reference NMS gather omits the batch offset
    (net_canny.py:131-137), so for batch>=2 it reads sample 0's directional
    responses for every sample — a bug we deliberately do not reproduce."""
    ref = _load_reference_canny()
    batch = 1
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(batch, channels, 32, 48)).astype(np.float32) * 100
    model = ref.Canny("cpu", batch_size=batch, threshold=threshold,
                      num_channel=channels)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()       # (N,1,H,W)
    got = np.asarray(canny_edges(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 threshold=threshold))   # (N,H,W,1)
    got = got.transpose(0, 3, 1, 2)
    # NMS is a hard threshold on continuous values: tolerate rare borderline flips
    mismatch = np.abs(got - want) > 1e-3
    assert mismatch.mean() < 0.01, f"{mismatch.mean():.4f} of pixels differ"


def test_canny_batch_agnostic():
    """The reference gather breaks on partial batches (net_canny.py:131-137);
    ours must not."""
    rng = np.random.default_rng(1)
    for bs in (1, 3, 5):
        x = jnp.asarray(rng.uniform(0, 100, size=(bs, 16, 16, 1)).astype(np.float32))
        out = canny_edges(x, threshold=1.0)
        assert out.shape == (bs, 16, 16, 1)


@pytest.mark.parametrize("channels", [1, 3])
def test_canny_gradient_is_nan_free_on_flat_regions(channels):
    """sqrt'(0)=inf: piecewise-constant images (every synthetic band frame,
    tanh-saturated generator outputs) have exactly-zero Sobel magnitude over
    flat runs, and the masked where downstream turns 0*inf into NaN — one
    such step made the whole round-4 GAN gate go NaN within 10 iterations.
    The contour loss backpropagates through canny_edges by design (unlike
    the reference, whose train.py:186-189 detach makes it a constant), so
    the backward must be finite on exactly these inputs."""
    def loss(img):
        return jnp.abs(canny_edges(img, threshold=1.0)).mean()

    flat = jnp.full((1, 16, 32, channels), 0.3)
    banded = jnp.concatenate([jnp.zeros((2, 16, 16, channels)),
                              jnp.ones((2, 16, 16, channels))], axis=2)
    for img in (flat, banded):
        g = jax.grad(loss)(img)
        assert not bool(jnp.isnan(g).any())
    # and the edges themselves still fire on the band boundary
    assert float(canny_edges(banded * 100.0, threshold=1.0).max()) > 0


def test_unet_generator_shapes():
    model = unet_32(ngf=8, output_nc=1)
    variables = init_gan_net(model, jax.random.key(0), (1, 32, 64, 3))
    y = model.apply(variables, jnp.zeros((2, 32, 64, 3)), train=False,
                    mutable=False)
    assert y.shape == (2, 32, 64, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output


def test_unet256_full_size():
    model = unet_256(ngf=8, output_nc=1)
    variables = init_gan_net(model, jax.random.key(0), (1, 256, 512, 3))
    y = model.apply(variables, jnp.zeros((1, 256, 512, 3)), train=False,
                    mutable=False)
    assert y.shape == (1, 256, 512, 1)


def test_phased_convt_matches_dilated_exactly():
    """convt='phased' (dense 2x2 conv + depth-to-space) must be numerically
    equivalent to the nn.ConvTranspose formulation with the SAME params —
    it is an implementation detail, not a different model. Train mode too
    (BN batch stats must match)."""
    dilated = unet_32(ngf=8, output_nc=1)
    phased = unet_32(ngf=8, output_nc=1, convt="phased")
    variables = init_gan_net(dilated, jax.random.key(0), (1, 32, 64, 3))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 32, 64, 3)).astype(np.float32))
    y_ref = dilated.apply(variables, x, train=False, mutable=False)
    y_got = phased.apply(variables, x, train=False, mutable=False)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    (t_ref, m_ref) = dilated.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
    (t_got, m_got) = phased.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), m_got, m_ref)
    # identical param pytree structure (checkpoints interchange freely)
    ref_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    got_vars = init_gan_net(phased, jax.random.key(1), (1, 32, 64, 3))
    got_shapes = jax.tree.map(lambda a: a.shape, got_vars["params"])
    assert ref_shapes == got_shapes


def test_resnet_generator_shapes():
    model = resnet_6(ngf=8, output_nc=3)
    variables = init_gan_net(model, jax.random.key(0), (1, 32, 64, 1))
    y = model.apply(variables, jnp.zeros((2, 32, 64, 1)), train=False,
                    mutable=False)
    assert y.shape == (2, 32, 64, 3)


def test_patchgan_patch_map():
    model = patchgan(ndf=8)
    variables = init_gan_net(model, jax.random.key(0), (1, 64, 128, 1))
    y = model.apply(variables, jnp.zeros((2, 64, 128, 1)), train=False,
                    mutable=False)
    # 3 stride-2 convs then two stride-1 k4/p1 convs (each shaves one row/col):
    # 64x128 -> 8x16 -> 7x15 -> 6x14 patch score map (matches torch layout)
    assert y.shape == (2, 6, 14, 1)


def test_image_pool_statistics():
    pool = ImagePool(50, seed=0)
    first = np.ones((4, 2, 2, 1), np.float32)
    out = pool.query(first)
    np.testing.assert_array_equal(out, first)  # pool not full: passthrough
    # fill the pool
    for i in range(20):
        pool.query(np.full((4, 2, 2, 1), float(i + 2), np.float32))
    assert pool.num_imgs == 50
    fresh = np.full((64, 2, 2, 1), 99.0, np.float32)
    out = pool.query(fresh)
    frac_fresh = (out == 99.0).all(axis=(1, 2, 3)).mean()
    assert 0.2 < frac_fresh < 0.8  # ~50% swap rate


def test_gan_to_seg_tensor():
    x = jnp.zeros((1, 4, 4, 3))  # denorm -> 0.5 -> 127.5
    y = np.asarray(gan_to_seg_tensor(x, "source"))
    np.testing.assert_allclose(y[..., 0], 127.5 - 104.00698793, rtol=1e-5)
    np.testing.assert_allclose(y[..., 2], 127.5 - 122.67891434, rtol=1e-5)
    y1 = np.asarray(gan_to_seg_tensor(jnp.zeros((1, 4, 4, 1)), "target"))
    np.testing.assert_allclose(y1[..., 0], 127.5 - 116.66876762, rtol=1e-5)


@pytest.mark.slow
def test_cyclegan_two_steps():
    key = jax.random.key(0)
    g_s2t = unet_32(ngf=8, output_nc=1)
    g_t2s = unet_32(ngf=8, output_nc=3)
    d_t = patchgan(ndf=8)
    d_s = patchgan(ndf=8)
    g_vars = {"s2t": init_gan_net(g_s2t, key, (1, 32, 64, 3)),
              "t2s": init_gan_net(g_t2s, key, (1, 32, 64, 1))}
    d_vars = {"t": init_gan_net(d_t, key, (1, 32, 64, 1)),
              "s": init_gan_net(d_s, key, (1, 32, 64, 3))}
    state = create_gan_state(g_vars=g_vars, d_vars=d_vars, learning_rate=1e-4)
    g_step, d_step = make_gan_steps(
        g_apply={"s2t": g_s2t.apply, "t2s": g_t2s.apply},
        d_apply={"t": d_t.apply, "s": d_s.apply},
        cycle=True, with_contour=True)

    rng = np.random.default_rng(0)
    real_s = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    real_t = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 1)).astype(np.float32))

    pool_s, pool_t = ImagePool(50), ImagePool(50)
    for _ in range(2):
        state, metrics, outs = g_step(state, real_s, real_t)
        fake_s = jnp.asarray(pool_s.query(outs["fake_s"]))
        fake_t = jnp.asarray(pool_t.query(outs["fake_t"]))
        state, d_metrics = d_step(state, {"s": real_s, "t": real_t},
                                  {"s": fake_s, "t": fake_t})
    for k, v in {**metrics, **d_metrics}.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 2


@pytest.mark.slow
def test_one_direction_gan_steps():
    """main_gan path: s2t generator + d_t only (cycle=False)."""
    key = jax.random.key(0)
    g_s2t = unet_32(ngf=8, output_nc=1)
    d_t = patchgan(ndf=8)
    g_vars = {"s2t": init_gan_net(g_s2t, key, (1, 32, 64, 3))}
    d_vars = {"t": init_gan_net(d_t, key, (1, 32, 64, 1))}
    state = create_gan_state(g_vars=g_vars, d_vars=d_vars, learning_rate=1e-4)
    g_step, d_step = make_gan_steps(
        g_apply={"s2t": g_s2t.apply}, d_apply={"t": d_t.apply},
        cycle=False, with_contour=True)
    rng = np.random.default_rng(0)
    real_s = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    real_t = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 1)).astype(np.float32))
    pool = ImagePool(50)
    state, metrics, outs = g_step(state, real_s, real_t)
    assert "fake_s" not in outs and "g_t2s" not in metrics
    state, d_metrics = d_step(state, {"t": real_t},
                              {"t": jnp.asarray(pool.query(outs["fake_t"]))})
    for k, v in {**metrics, **d_metrics}.items():
        assert np.isfinite(float(v)), k


def test_device_pool_matches_host_semantics():
    """DevicePool: fill phase passes inputs through and stores them; once
    full, ~50% of outputs come from the buffer (misc.py:135-183 semantics)."""
    from thermal_semantic_segmentation_tpu.ops.image_pool import (
        create_device_pool, device_pool_query)

    P = 6
    pool = create_device_pool(P, (2, 2, 1), seed=0)
    rng = np.random.default_rng(1)
    first = jnp.asarray(rng.normal(size=(P, 2, 2, 1)).astype(np.float32))
    out, pool = device_pool_query(pool, first, pool_size=P)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(first))  # fill
    assert int(pool.count) == P
    np.testing.assert_array_equal(np.asarray(pool.buffer), np.asarray(first))

    # full phase: outputs are either the incoming image or a stored one
    stored = {float(x) for x in np.asarray(first).reshape(P, -1)[:, 0]}
    swaps = 0
    for step in range(20):
        batch = jnp.full((4, 2, 2, 1), 100.0 + step, jnp.float32)
        out, pool = device_pool_query(pool, batch, pool_size=P)
        for v in np.asarray(out).reshape(4, -1)[:, 0]:
            if float(v) != 100.0 + step:
                swaps += 1
    assert 10 <= swaps <= 70, swaps   # ~50% of 80 queries, generous bounds
    assert int(pool.count) == P

    # pool_size=0 -> pass-through
    p0 = create_device_pool(0, (2, 2, 1))
    out, p0 = device_pool_query(p0, first, pool_size=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(first))


@pytest.mark.slow
def test_fused_gan_step():
    """One jitted G+pool+D step: finite losses, advancing state, pool fills."""
    from thermal_semantic_segmentation_tpu.train.gan import make_fused_gan_step

    key = jax.random.key(0)
    g_s2t = unet_32(ngf=8, output_nc=1)
    g_t2s = unet_32(ngf=8, output_nc=3)
    d_t, d_s = patchgan(ndf=8), patchgan(ndf=8)
    g_vars = {"s2t": init_gan_net(g_s2t, key, (1, 32, 64, 3)),
              "t2s": init_gan_net(g_t2s, key, (1, 32, 64, 1))}
    d_vars = {"t": init_gan_net(d_t, key, (1, 32, 64, 1)),
              "s": init_gan_net(d_s, key, (1, 32, 64, 3))}
    state = create_gan_state(g_vars=g_vars, d_vars=d_vars, learning_rate=1e-4)
    step, make_pools = make_fused_gan_step(
        pool_size=8,
        g_apply={"s2t": g_s2t.apply, "t2s": g_t2s.apply},
        d_apply={"t": d_t.apply, "s": d_s.apply}, cycle=True)
    pools = make_pools({"t": (32, 64, 1), "s": (32, 64, 3)}, seed=0)

    rng = np.random.default_rng(0)
    real_s = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    real_t = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 1)).astype(np.float32))
    for _ in range(3):
        state, pools, metrics = step(state, pools, real_s, real_t)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 3
    assert int(pools["t"].count) == 6  # 3 steps x batch 2, below pool_size


def test_fused_passes_match_sequential():
    """fused_passes=True (vmapped 2B s2t / D real+fake passes) produces the
    same losses, params, and running stats as the sequential reference-shaped
    passes — per-slice BN under vmap == per-pass BN, and the running-stat
    fold reproduces the reference accumulation order exactly."""
    from thermal_semantic_segmentation_tpu.train.gan import make_fused_gan_step

    key = jax.random.key(0)
    g_s2t = unet_32(ngf=8, output_nc=1)
    g_t2s = unet_32(ngf=8, output_nc=3)
    d_t, d_s = patchgan(ndf=8), patchgan(ndf=8)
    rng = np.random.default_rng(1)
    real_s = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    real_t = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 1)).astype(np.float32))

    results = {}
    for fused in (False, True):
        g_vars = {"s2t": init_gan_net(g_s2t, key, (1, 32, 64, 3)),
                  "t2s": init_gan_net(g_t2s, key, (1, 32, 64, 1))}
        d_vars = {"t": init_gan_net(d_t, key, (1, 32, 64, 1)),
                  "s": init_gan_net(d_s, key, (1, 32, 64, 3))}
        state = create_gan_state(g_vars=g_vars, d_vars=d_vars,
                                 learning_rate=1e-4)
        step, make_pools = make_fused_gan_step(
            pool_size=8,
            g_apply={"s2t": g_s2t.apply, "t2s": g_t2s.apply},
            d_apply={"t": d_t.apply, "s": d_s.apply}, cycle=True,
            fused_passes=fused)
        pools = make_pools({"t": (32, 64, 1), "s": (32, 64, 3)}, seed=0)
        for _ in range(2):
            state, pools, metrics = step(state, pools, real_s, real_t)
        results[fused] = (jax.tree.map(np.asarray, metrics),
                          jax.tree.map(np.asarray, state.g_params),
                          jax.tree.map(np.asarray, state.g_stats),
                          jax.tree.map(np.asarray, state.d_stats))
    for k in results[True][0]:
        np.testing.assert_allclose(results[True][0][k], results[False][0][k],
                                   rtol=2e-4, atol=1e-6, err_msg=k)
    for name, idx in [("g_params", 1), ("g_stats", 2), ("d_stats", 3)]:
        for a, b in zip(jax.tree.leaves(results[True][idx]),
                        jax.tree.leaves(results[False][idx])):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6,
                                       err_msg=name)


@pytest.mark.slow
def test_cyclegan_semantic_consistency_loss():
    """-sem_loss path (train_gan.py:126 semantics; the reference main.py's
    own train.py:201 crashes on an undefined label_s): frozen legacy seg
    nets score fake_t against label_s and fake_s against argmax(real_t
    preds). Gradients must flow to the generators but NOT to the sem nets."""
    from thermal_semantic_segmentation_tpu.models.deeplab import DeepLabV2

    key = jax.random.key(0)
    g_s2t = unet_32(ngf=8, output_nc=1)
    g_t2s = unet_32(ngf=8, output_nc=3)
    d_t, d_s = patchgan(ndf=8), patchgan(ndf=8, input_nc=3)
    g_vars = {"s2t": init_gan_net(g_s2t, key, (1, 32, 64, 3)),
              "t2s": init_gan_net(g_t2s, key, (1, 32, 64, 1))}
    d_vars = {"t": init_gan_net(d_t, key, (1, 32, 64, 1)),
              "s": init_gan_net(d_s, key, (1, 32, 64, 3))}
    sem_s = DeepLabV2(num_classes=19, num_channels=3, head="legacy",
                      layers=(1, 1, 1, 1))
    sem_t = DeepLabV2(num_classes=19, num_channels=1, head="legacy",
                      layers=(1, 1, 1, 1))
    sem_vars = {"s": init_gan_net(sem_s, key, (1, 32, 64, 3)),
                "t": init_gan_net(sem_t, key, (1, 32, 64, 1))}
    sem_vars_np = jax.tree.map(np.asarray, sem_vars)  # frozen snapshot

    state = create_gan_state(g_vars=g_vars, d_vars=d_vars, learning_rate=1e-3)
    g_step, d_step = make_gan_steps(
        g_apply={"s2t": g_s2t.apply, "t2s": g_t2s.apply},
        d_apply={"t": d_t.apply, "s": d_s.apply},
        cycle=True, sem_apply={"s": sem_s.apply, "t": sem_t.apply})

    rng = np.random.default_rng(0)
    real_s = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    real_t = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 1)).astype(np.float32))
    label_s = jnp.asarray(rng.integers(0, 19, (2, 32, 64)))
    g0 = np.asarray(jax.tree.leaves(state.g_params["s2t"])[0]).copy()
    state, metrics, outs = g_step(state, real_s, real_t, label_s, sem_vars,
                                  with_sem=True)
    assert np.isfinite(float(metrics["sem_s2t"]))
    assert np.isfinite(float(metrics["sem_t2s"]))
    assert float(metrics["sem_s2t"]) > 0.0  # CE on random preds is positive
    g1 = np.asarray(jax.tree.leaves(state.g_params["s2t"])[0])
    assert not np.allclose(g0, g1)  # grads flowed to the generator
    # ...and the frozen sem nets were not touched by the update
    for a, b in zip(jax.tree.leaves(sem_vars_np),
                    jax.tree.leaves(jax.tree.map(np.asarray, sem_vars))):
        np.testing.assert_array_equal(a, b)


def test_gan_to_seg_tensor_matches_reference_transmit():
    """tensor_transmit (train.py:60-75): de-normalize, BGR flip + ImageNet
    mean subtraction for source, thermal mean subtraction for target."""
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 4, 6, 3)).astype(np.float32)
    out = np.asarray(gan_to_seg_tensor(jnp.asarray(x), "source"))
    denorm = (x * 0.5 + 0.5) * 255.0
    expect = denorm[..., ::-1] - np.asarray(
        [104.00698793, 116.66876762, 122.67891434], np.float32)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    t = rng.uniform(-1, 1, (2, 4, 6, 1)).astype(np.float32)
    out_t = np.asarray(gan_to_seg_tensor(jnp.asarray(t), "target"))
    np.testing.assert_allclose(
        out_t, (t * 0.5 + 0.5) * 255.0 - 116.66876762, rtol=1e-6)
