"""Integration: seg train step + validate on a tiny model, incl. sharded run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.core.schedule import ReduceLROnPlateau
from thermal_semantic_segmentation_tpu.eval.validate import seg_validate
from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab
from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from thermal_semantic_segmentation_tpu.train.seg import (
    build_seg_eval_step,
    create_seg_state,
    make_seg_train_step,
)

TINY = dict(num_classes=13, num_channels=1, layers=(1, 1, 1, 1), image_size=(64, 128))
LABEL_HW = (64, 128)


def _batch(bs=2, seed=0):
    rng = np.random.default_rng(seed)
    image = rng.uniform(0, 1, size=(bs, 64, 128, 1)).astype(np.float32)
    label = rng.integers(0, 13, size=(bs, 64, 128)).astype(np.int64)
    return jnp.asarray(image), jnp.asarray(label)


@pytest.fixture(scope="module")
def _tiny_model_cached():
    model, variables = create_deeplab(jax.random.key(0), **TINY)
    return model, jax.tree.map(np.asarray, variables)  # host copy (steps donate)


@pytest.fixture()
def tiny_model(_tiny_model_cached):
    model, host_vars = _tiny_model_cached
    return model, jax.tree.map(jnp.asarray, host_vars)


def test_train_step_reduces_loss(tiny_model):
    model, variables = tiny_model
    state = create_seg_state(model, variables, learning_rate=5e-3)
    step = make_seg_train_step(ignore_index=12, label_hw=LABEL_HW, base_lr=5e-3)
    image, label = _batch()
    losses = []
    for _ in range(8):
        state, loss = step(state, image, label)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_lr_scale_controls_updates(tiny_model):
    model, variables = tiny_model
    state = create_seg_state(model, variables, learning_rate=1e-3)
    step = make_seg_train_step(ignore_index=12, label_hw=LABEL_HW, base_lr=1e-3)
    image, label = _batch()
    before = jax.tree.map(np.asarray, state.params)  # snapshot (step donates state)
    frozen = state.replace(lr_scale=jnp.zeros(()))
    new_state, _ = step(frozen, image, label)
    # zero LR scale -> no parameter movement
    diffs = jax.tree.map(lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
                         new_state.params, before)
    assert max(jax.tree.leaves(diffs)) == 0.0


def test_plateau_scheduler_torch_semantics():
    sched = ReduceLROnPlateau(patience=2, factor=0.5)
    vals = [1.0, 1.0, 1.0, 1.0, 1.0]
    scales = [sched.step(v) for v in vals]
    # patience=2: first non-improving feeds at idx1..; scale halves at idx3
    assert scales == [1.0, 1.0, 1.0, 0.5, 0.5]
    assert sched.step(0.1) == 0.5  # improvement resets counter, scale sticks


def test_validate_loop(tiny_model):
    model, variables = tiny_model

    class FakeLoader:
        def __iter__(self):
            for seed in range(3):
                image, label = _batch(seed=seed)
                yield {"image": np.asarray(image), "label": np.asarray(label)}

    mean_iu, val_loss, cls_iu = seg_validate(model, variables, FakeLoader(),
                                             num_classes=13, ignore_index=12,
                                             label_hw=LABEL_HW)
    assert 0.0 <= mean_iu <= 1.0
    assert val_loss > 0
    assert len(cls_iu) == 12


def test_train_step_sharded_over_mesh(tiny_model):
    """Data-parallel step over the simulated 8-device mesh."""
    model, variables = tiny_model
    mesh = make_mesh()
    assert mesh.size == 8
    state = create_seg_state(model, variables, learning_rate=1e-3)
    state = replicate(mesh, state)
    step = make_seg_train_step(ignore_index=12, label_hw=LABEL_HW, base_lr=1e-3)
    image, label = _batch(bs=8)
    image, label = shard_batch(mesh, (image, label))
    state, loss = step(state, image, label)
    assert np.isfinite(float(loss))
    # params stay replicated after the update
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_lr_groups_head_updates_larger(tiny_model):
    """1x/10x split: with identical grads scale, head params move ~10x more."""
    model, variables = tiny_model
    host_vars = jax.tree.map(np.asarray, variables)
    results = {}
    for groups in (False, True):
        state = create_seg_state(model, jax.tree.map(jnp.asarray, host_vars),
                                 learning_rate=1e-3, lr_groups=groups)
        step = make_seg_train_step(ignore_index=12, label_hw=LABEL_HW, base_lr=1e-3)
        image, label = _batch()
        before = jax.tree.map(np.asarray, state.params)
        state, _ = step(state, image, label)
        delta_head = float(np.abs(np.asarray(
            state.params["layer5"]["head_conv"]["kernel"]) -
            before["layer5"]["head_conv"]["kernel"]).mean())
        results[groups] = delta_head
    assert results[True] > 3.0 * results[False]


def test_validate_real_loader_batch4_equals_batch1(tiny_model, tmp_path):
    """End-to-end over a synthetic Freiburg test tree whose size (5) is not
    divisible by the batch (4): drop_last=False + pad_to_batch must score every
    image, bit-identical to the batch-1 reference protocol
    (/root/reference/segmentation_evaluate.py:24-80)."""
    from tests.synthetic import make_freiburg_tree
    from thermal_semantic_segmentation_tpu.data import transforms as T
    from thermal_semantic_segmentation_tpu.data.freiburg import FreiburgTest
    from thermal_semantic_segmentation_tpu.data.loader import DataLoader

    model, variables = tiny_model
    root = make_freiburg_tree(str(tmp_path / "freiburg"), n_train=1, n_test=5)
    tf = T.Compose([T.Resize((128, 64)), T.ToArray()])
    ds = FreiburgTest(root, "test", "IR", transforms=tf, with_label=True)
    assert len(ds) == 5

    def run(bs):
        loader = DataLoader(ds, bs, shuffle=False, drop_last=False, seed=0)
        return seg_validate(model, variables, loader, num_classes=13,
                            ignore_index=12, label_hw=LABEL_HW, pad_to_batch=bs)

    ref, batched = run(1), run(4)
    np.testing.assert_allclose(ref[0], batched[0], rtol=1e-6)
    np.testing.assert_allclose(ref[1], batched[1], rtol=1e-5)


def test_eval_step_follows_label_resolution(tiny_model):
    """Logit upsampling tracks the label's own (H, W), not a fixed size.

    The reference hardcodes (256, 512) (segmentation_evaluate.py:37) because
    its eval labels are always that size; our eval must also work when a CLI
    runs a reduced protocol (e.g. the tiny CI chain)."""
    model, variables = tiny_model
    eval_step = build_seg_eval_step(model, num_classes=13, ignore_index=12)
    for hw in ((64, 128), (32, 64), (96, 192)):
        rng = np.random.default_rng(1)
        image = jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 1)).astype(np.float32))
        label = jnp.asarray(rng.integers(0, 13, (2, *hw)))
        hist, loss, pred = eval_step(variables, image, label)
        assert pred.shape == (2, *hw)
        assert hist.shape == (13, 13) and float(jnp.sum(hist)) == 2 * hw[0] * hw[1]
        assert np.isfinite(float(loss))


def test_validate_pad_to_batch_is_metric_exact(tiny_model):
    """Tail padding with ignore labels must not change any score."""
    model, variables = tiny_model

    class Loader:
        def __init__(self, sizes):
            self.sizes = sizes

        def __iter__(self):
            for i, bs in enumerate(self.sizes):
                image, label = _batch(bs=bs, seed=i)
                yield {"image": np.asarray(image), "label": np.asarray(label)}

    ref = seg_validate(model, variables, Loader([2, 2, 1]), num_classes=13,
                       ignore_index=12, label_hw=LABEL_HW)
    padded = seg_validate(model, variables, Loader([2, 2, 1]), num_classes=13,
                          ignore_index=12, label_hw=LABEL_HW, pad_to_batch=2)
    np.testing.assert_allclose(ref[0], padded[0], rtol=1e-6)   # mean_iu
    np.testing.assert_allclose(ref[1], padded[1], rtol=1e-5)   # val_loss
    for k in ref[2]:
        if np.isnan(ref[2][k]):
            assert np.isnan(padded[2][k])
        else:
            np.testing.assert_allclose(ref[2][k], padded[2][k], rtol=1e-6)


@pytest.mark.parametrize("remat", ["dots", "full"])
def test_remat_matches_baseline_exactly(remat):
    """Backbone remat is a pure memory/speed knob: gradients, batch stats,
    and loss must be bit-identical to remat='none' (measured on TPU:
    'full' halves peak temp HBM, 3574 -> 1601 MiB at batch 8, 256x512)."""
    image, label = _batch()

    def grads_with(mode):
        model, variables = create_deeplab(jax.random.key(0), remat=mode, **TINY)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(3)})
            return jnp.mean(out["out"].astype(jnp.float32) ** 2), mut
        (loss, mut), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
        return float(loss), jax.tree.map(np.asarray, (grads, mut))

    loss0, ref = grads_with("none")
    loss1, got = grads_with(remat)
    assert loss0 == loss1
    jax.tree.map(np.testing.assert_array_equal, ref, got)


def test_grad_accum_matches_sequential_microbatches(tiny_model):
    """grad_accum=A must equal: per-microbatch grads averaged into ONE
    optimizer update, BN stats threaded sequentially, per-microbatch dropout
    keys — verified against a hand-rolled unrolled reference. SGD is used
    because its update is linear in the gradient (Adam's m/sqrt(v) is
    scale-invariant and amplifies f32 scan-vs-unroll noise near zero, hiding
    exactly the scale bugs this test exists to catch)."""
    model, variables = tiny_model
    image, label = _batch(bs=4, seed=7)

    # accumulated step
    state = create_seg_state(model, variables, learning_rate=1e-3,
                             optimizer="sgd")
    step = make_seg_train_step(ignore_index=12, label_hw=LABEL_HW,
                               base_lr=1e-3, grad_accum=2)
    host_vars = jax.tree.map(np.asarray, variables)  # snapshot (donation)
    new_state, loss = step(state, image, label)
    got_params = jax.tree.map(np.asarray, new_state.params)
    got_stats = jax.tree.map(np.asarray, new_state.batch_stats)
    got_loss = float(loss)

    # reference: explicit python loop over the two microbatches
    import optax
    from thermal_semantic_segmentation_tpu.losses import cross_entropy
    from thermal_semantic_segmentation_tpu.ops.resize import upsample_logits
    variables = jax.tree.map(jnp.asarray, host_vars)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3, momentum=0.9)
    opt_state = tx.init(params)
    rng = jax.random.fold_in(jax.random.key(0), 0)

    def loss_fn(p, stats, im, lab, key):
        out, mut = model.apply({"params": p, "batch_stats": stats}, im,
                               train=True, mutable=["batch_stats"],
                               rngs={"dropout": key})
        logits = upsample_logits(out["out"], *LABEL_HW)
        return (cross_entropy(logits, lab, ignore_index=12),
                mut["batch_stats"])

    @jax.jit
    def ref(params, stats, opt_state):
        grad_sum, losses = None, []
        for i in range(2):
            im, lab = image[2 * i:2 * i + 2], label[2 * i:2 * i + 2]
            (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, stats, im, lab, jax.random.fold_in(rng, i))
            losses.append(l)
            grad_sum = g if grad_sum is None else jax.tree.map(
                jnp.add, grad_sum, g)
        grads = jax.tree.map(lambda g: g / 2, grad_sum)
        opt_state.hyperparams["learning_rate"] = 1e-3
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, sum(losses) / 2

    want_params, want_stats, want_loss = ref(params, stats, opt_state)
    np.testing.assert_allclose(got_loss, float(want_loss), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, np.asarray(b), rtol=2e-5, atol=1e-7), got_stats, want_stats)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, np.asarray(b), rtol=2e-5, atol=1e-7), got_params, want_params)


def test_freeze_bn_pins_affine_params_but_not_stats():
    """freeze_bn=True (reference Deeplab factory arg, deeplabv2.py:356):
    BN scale/bias must stay bit-identical across train steps while other
    params move AND batch stats keep updating — the reference's
    freeze_bn_func only sets requires_grad=False on BN weight/bias
    (deeplabv2.py:349-354); it never calls m.eval()."""
    from thermal_semantic_segmentation_tpu.models.deeplab import bn_param_mask

    model, variables = create_deeplab(jax.random.key(0), freeze_bn=True, **TINY)
    mask = bn_param_mask(variables["params"], variables["batch_stats"])
    assert any(jax.tree.leaves(mask)) and not all(jax.tree.leaves(mask))
    before_params = jax.tree.map(np.asarray, variables["params"])
    before_stats = jax.tree.map(np.asarray, variables["batch_stats"])

    state = create_seg_state(model, variables, learning_rate=5e-3)
    step = make_seg_train_step(ignore_index=12, label_hw=LABEL_HW, base_lr=5e-3)
    image, label = _batch()
    for _ in range(3):
        state, _ = step(state, image, label)

    moved = []
    for (path, after), (_, before), (_, frozen) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(before_params),
            jax.tree_util.tree_leaves_with_path(mask)):
        if frozen:
            np.testing.assert_array_equal(np.asarray(after), before,
                                          err_msg=str(path))
        else:
            moved.append(float(np.max(np.abs(np.asarray(after) - before))))
    assert max(moved) > 0.0
    stat_delta = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
        state.batch_stats, before_stats)
    assert max(jax.tree.leaves(stat_delta)) > 0.0  # stats DO update


def test_grad_accum_rejects_indivisible_batch(tiny_model):
    model, variables = tiny_model
    state = create_seg_state(model, variables, learning_rate=1e-3)
    step = make_seg_train_step(ignore_index=12, label_hw=LABEL_HW,
                               base_lr=1e-3, grad_accum=3)
    image, label = _batch(bs=4)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, image, label)


def test_validate_sharded_matches_unsharded(tiny_model):
    """seg_validate(mesh=...) shards eval batches over the device mesh;
    every score must match the single-device run (the confusion matrix is
    a count — sharding must not change it)."""
    import pytest

    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh, replicate)

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    model, variables = tiny_model

    class Loader:
        def __iter__(self):
            for i, bs in enumerate([4, 4, 1]):  # ragged tail shards too
                image, label = _batch(bs=bs, seed=i)
                yield {"image": np.asarray(image), "label": np.asarray(label)}

    ref = seg_validate(model, variables, Loader(), num_classes=13,
                       ignore_index=12, label_hw=LABEL_HW, pad_to_batch=4)
    with pytest.warns(UserWarning, match="does not divide"):
        mesh = make_mesh(batch_size=4)  # 4 of the 8 CPU devices
    assert mesh.size > 1
    import tempfile

    with tempfile.TemporaryDirectory() as viz:
        # visualize under the mesh: indexing row 0 of a sharded pred works
        sh = seg_validate(model, replicate(mesh, variables), Loader(),
                          num_classes=13, ignore_index=12, label_hw=LABEL_HW,
                          pad_to_batch=4, mesh=mesh,
                          visualize="save_one", save_root=viz)
        import os
        assert "0_prediction_0.png" in os.listdir(viz)
    np.testing.assert_allclose(ref[0], sh[0], rtol=1e-6)   # mean_iu
    np.testing.assert_allclose(ref[1], sh[1], rtol=1e-5)   # val_loss
    for k in ref[2]:
        if np.isnan(ref[2][k]):
            assert np.isnan(sh[2][k])
        else:
            np.testing.assert_allclose(ref[2][k], sh[2][k], rtol=1e-6)

    # sharded eval without a divisible pad_to_batch is a clear config error
    with pytest.raises(ValueError, match="divisible"):
        seg_validate(model, variables, Loader(), num_classes=13,
                     ignore_index=12, label_hw=LABEL_HW, mesh=mesh)
