"""Pseudo-label generation + prototype computation (library level)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab
from thermal_semantic_segmentation_tpu.train.prototypes import calc_prototypes
from thermal_semantic_segmentation_tpu.train.pseudo import generate_pseudo_labels

TINY = dict(num_classes=13, num_channels=1, layers=(1, 1, 1, 1), image_size=(64, 128))


class FakeLoader:
    def __init__(self, n_batches=2, bs=2, seed=0):
        self.n_batches = n_batches
        self.bs = bs
        self.seed = seed

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        for i in range(self.n_batches):
            yield {
                "image": rng.uniform(0, 1, (self.bs, 64, 128, 1)).astype(np.float32),
                "img_path": [f"im_{i}_{k}.png" for k in range(self.bs)],
            }


@pytest.fixture(scope="module")
def tiny():
    return create_deeplab(jax.random.key(0), **TINY)


def test_generate_hard_pseudo_labels(tiny, tmp_path):
    model, variables = tiny
    n = generate_pseudo_labels(model, variables, FakeLoader(),
                               save_path=str(tmp_path), soft=False, flip=False)
    assert n == 4
    files = sorted(os.listdir(tmp_path))
    assert "im_0_0.png" in files and "im_0_0_color.png" in files
    assert "im_0_0_conf.npy" in files
    png = np.array(Image.open(tmp_path / "im_0_0.png"))
    conf = np.load(tmp_path / "im_0_0_conf.npy")
    assert png.shape == conf.shape == (9, 17)  # stride-8 (ceil-mode) of 64x128


def test_generate_soft_and_flip(tiny, tmp_path):
    model, variables = tiny
    generate_pseudo_labels(model, variables, FakeLoader(), soft=True,
                           save_path=str(tmp_path / "soft"))
    soft = np.load(tmp_path / "soft" / "im_0_0.npy")
    assert soft.shape[0] == 13  # channel-first like the reference .npy format
    np.testing.assert_allclose(soft.sum(0), 1.0, rtol=1e-4)

    generate_pseudo_labels(model, variables, FakeLoader(), soft=False, flip=True,
                           save_path=str(tmp_path / "flip"))
    png = np.array(Image.open(tmp_path / "flip" / "im_0_0.png"))
    assert png.shape == (64, 128)  # flip TTA path upsamples to input res


class RaggedLoader(FakeLoader):
    """Batches of [4, 1]: 5 images, last batch partial (drop_last=False)."""

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        for i, bs in enumerate([4, 1]):
            yield {
                "image": rng.uniform(0, 1, (bs, 64, 128, 1)).astype(np.float32),
                "img_path": [f"im_{i}_{k}.png" for k in range(bs)],
            }


class TraceCountingModel:
    """Counts how many times model.apply is TRACED (each new jit input shape
    retraces, so the count exposes tail-shape recompiles)."""

    def __init__(self, model):
        self._model = model
        self.traces = 0

    def apply(self, *args, **kwargs):
        self.traces += 1
        return self._model.apply(*args, **kwargs)


def test_pad_to_batch_compiles_once_and_writes_every_image(tiny, tmp_path):
    """5 images at batch 4 (tail of 1): pad_to_batch must keep ONE compiled
    shape (no retrace for the tail) and still write all 5 images' artifacts.
    The reference instead drops the tail via drop_last
    (/root/reference/generate_pseudo_label.py:33-38 serves every image only
    when the dataset divides evenly)."""
    model, variables = tiny
    counting = TraceCountingModel(model)
    n = generate_pseudo_labels(counting, variables, RaggedLoader(),
                               save_path=str(tmp_path), soft=False, flip=False,
                               pad_to_batch=4)
    assert n == 5
    traces_after_both = counting.traces
    assert traces_after_both > 0
    # same pipeline over ONLY the full batch: identical trace count proves the
    # padded tail added no compile
    counting2 = TraceCountingModel(model)
    generate_pseudo_labels(counting2, variables, FakeLoader(n_batches=1, bs=4),
                           save_path=str(tmp_path / "one"), soft=False,
                           flip=False, pad_to_batch=4)
    assert traces_after_both == counting2.traces
    files = sorted(os.listdir(tmp_path))
    for i, bs in enumerate([4, 1]):
        for k in range(bs):
            assert f"im_{i}_{k}.png" in files
            assert f"im_{i}_{k}_conf.npy" in files
    # padded rows must not leak into artifacts: confs are per-real-image only
    assert "im_1_1.png" not in files and "im_1_1_conf.npy" not in files


def test_calc_prototypes(tiny):
    model, variables = tiny
    protos, counts = calc_prototypes(model, variables, FakeLoader(),
                                     num_classes=13)
    assert protos.shape == (13, 256)
    assert counts.sum() > 0
    # prototypes for classes that appeared are nonzero
    for c in range(13):
        if counts[c] > 0:
            assert np.abs(protos[c]).sum() > 0


def test_generate_pseudo_labels_sharded_matches(tiny, tmp_path):
    """mesh= shards pseudo-gen batches over the CPU mesh (ragged tail
    included); artifacts must match the single-device run."""
    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh, replicate)

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    model, variables = tiny
    n0 = generate_pseudo_labels(model, variables, RaggedLoader(),
                                save_path=str(tmp_path / "ref"),
                                pad_to_batch=4)
    with pytest.warns(UserWarning, match="does not divide"):
        mesh = make_mesh(batch_size=4)  # 4 of the 8 CPU devices
    assert mesh.size > 1
    n1 = generate_pseudo_labels(model, replicate(mesh, variables),
                                RaggedLoader(),
                                save_path=str(tmp_path / "sharded"),
                                pad_to_batch=4, mesh=mesh)
    assert n0 == n1 == 5
    for name in sorted(os.listdir(tmp_path / "ref")):
        a = np.asarray(Image.open(tmp_path / "ref" / name)) \
            if name.endswith(".png") else np.load(tmp_path / "ref" / name)
        b = np.asarray(Image.open(tmp_path / "sharded" / name)) \
            if name.endswith(".png") else np.load(tmp_path / "sharded" / name)
        # ids are argmax over f32 logits; sharded and unsharded runs may
        # disagree only on exact ties (none expected at these sizes)
        np.testing.assert_allclose(a, b, atol=1e-5)

    with pytest.raises(ValueError, match="divisible"):
        generate_pseudo_labels(model, variables, RaggedLoader(),
                               save_path=str(tmp_path / "bad"), mesh=mesh)


def test_calc_prototypes_sharded_matches(tiny):
    """mesh= shards prototype computation; per-class means must match the
    single-device run (sums/counts reduce across chips inside the jit)."""
    from thermal_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh, replicate)

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    model, variables = tiny
    ref_p, ref_c = calc_prototypes(model, variables, FakeLoader(bs=4),
                                   num_classes=13)
    with pytest.warns(UserWarning, match="does not divide"):
        mesh = make_mesh(batch_size=4)  # 4 of the 8 CPU devices
    assert mesh.size > 1
    sh_p, sh_c = calc_prototypes(model, replicate(mesh, variables),
                                 FakeLoader(bs=4), num_classes=13, mesh=mesh)
    np.testing.assert_allclose(ref_c, sh_c, rtol=1e-6)
    np.testing.assert_allclose(ref_p, sh_p, rtol=1e-4, atol=1e-6)
