"""Native C++ decoder: exact decode parity vs PIL, batch preprocessing checks."""

import numpy as np
import pytest
from PIL import Image

from thermal_semantic_segmentation_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native decoder not buildable here")


def _write_png16(path, arr):
    Image.fromarray(arr.astype(np.uint16)).save(path)


def _write_rgb(path, arr, fmt="PNG"):
    Image.fromarray(arr.astype(np.uint8)).save(path, format=fmt)


def test_raw_decode_parity_16bit(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 65535, (37, 53)).astype(np.uint16)
    p = str(tmp_path / "a.png")
    _write_png16(p, arr)
    got = nl.decode_raw(p)
    np.testing.assert_array_equal(got[..., 0], arr)


def test_raw_decode_parity_rgb_png_and_jpeg(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (24, 31, 3)).astype(np.uint8)
    p = str(tmp_path / "b.png")
    _write_rgb(p, arr)
    got = nl.decode_raw(p)
    np.testing.assert_array_equal(got, arr)
    # jpeg is lossy: decoded pixels must agree with PIL's decode of the SAME file
    j = str(tmp_path / "c.jpg")
    _write_rgb(arr=arr, path=j, fmt="JPEG")
    got_j = nl.decode_raw(j)
    want_j = np.asarray(Image.open(j))
    assert got_j.shape == want_j.shape
    # libjpeg versions may differ in IDCT path; allow off-by-few
    assert np.abs(got_j.astype(int) - want_j.astype(int)).max() <= 3


def test_ir_batch_semantics(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    for i in range(4):
        arr = rng.integers(21000, 26000, (40, 120)).astype(np.uint16)
        p = str(tmp_path / f"ir_{i}.png")
        _write_png16(p, arr)
        paths.append(p)
    out = nl.decode_ir_batch(paths)
    assert out.shape == (4, 320, 700, 1)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # window edges must map to 0 and 1 somewhere given the 21000..26000 range
    assert out.min() == 0.0 and out.max() == 1.0


def test_rgb_batch_shapes(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"rgb_{i}.png")
        _write_rgb(p, rng.integers(0, 255, (40, 120, 3)))
        paths.append(p)
    out = nl.decode_rgb_batch(paths)
    assert out.shape == (3, 320, 700, 3) and out.dtype == np.uint8


def test_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        nl.decode_ir_batch([str(tmp_path / "nope.png")])


def test_loader_native_batch_path(tmp_path):
    """Freiburg(native_decode=True) routes whole batches through the native
    decoder; shapes/dtypes/value range match the PIL path (resize kernels
    differ: bilinear vs BICUBIC, so values are statistically, not bitwise,
    equal)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from synthetic import make_freiburg_tree
    from thermal_semantic_segmentation_tpu.data import transforms as T
    from thermal_semantic_segmentation_tpu.data.freiburg import Freiburg
    from thermal_semantic_segmentation_tpu.data.loader import DataLoader

    root = make_freiburg_tree(str(tmp_path / "fr"), n_train=6)
    tf = T.Compose([T.Resize((128, 64)), T.ToArray()])
    native_ds = Freiburg(root, "train", "IR", transforms=tf, native_decode=True)
    pil_ds = Freiburg(root, "train", "IR", transforms=tf)

    rngs = [np.random.default_rng(i) for i in range(3)]
    batch = native_ds.get_batch([0, 1, 2], rngs)
    assert batch is not None and len(batch) == 3
    for i, s in enumerate(batch):
        want = pil_ds.get(i, np.random.default_rng(i))
        assert s["image"].shape == want["image"].shape == (64, 128, 1)
        assert s["image"].dtype == np.float32
        np.testing.assert_array_equal(s["label"], want["label"])
        np.testing.assert_allclose(s["image"].mean(), want["image"].mean(),
                                   atol=0.02)

    loader = DataLoader(native_ds, 2, shuffle=False, drop_last=False, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert all(b["image"].shape == (2, 64, 128, 1) for b in batches)

    # self-train / translation modes have no native path -> None
    assert Freiburg(root, "train", "IR", transforms=tf, native_decode=True,
                    segmentation_mode=True,
                    ).get_batch([0], [np.random.default_rng(0)]) is None


def test_encode_png_roundtrip_exact(tmp_path):
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (3, 24, 31, 3)).astype(np.uint8)
    paths = [str(tmp_path / f"e_{i}.png") for i in range(3)]
    nl.encode_batch(paths, imgs)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(np.asarray(Image.open(p)), imgs[i])
    # grayscale (N, H, W) path
    gray = rng.integers(0, 255, (2, 16, 20)).astype(np.uint8)
    gpaths = [str(tmp_path / f"g_{i}.png") for i in range(2)]
    nl.encode_batch(gpaths, gray)
    for i, p in enumerate(gpaths):
        got = np.asarray(Image.open(p))
        assert Image.open(p).mode == "L"
        np.testing.assert_array_equal(got, gray[i])


def test_encode_bicubic_resize_matches_pil(tmp_path):
    """The C++ convolution resampler reproduces PIL BICUBIC (float weights vs
    Pillow's int16 fixed point: allow +-2). Covers both up- and downscale
    (the antialias filter-widening path)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    for wh in [(700, 320), (48, 20)]:
        p = str(tmp_path / f"r_{wh[0]}.png")
        nl.encode_batch([p], img[None], resize_wh=wh)
        want = np.asarray(Image.fromarray(img).resize(wh, Image.BICUBIC))
        got = np.asarray(Image.open(p))
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_encode_jpeg_close_to_pil_pipeline(tmp_path):
    """JPEG is lossy; the native encode of the resized image must decode close
    to what the PIL resize+save pipeline (translator.py parity path) yields."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (32, 64)).astype(np.uint8)  # 1-ch thermal-like
    p_nat = str(tmp_path / "n.jpg")
    nl.encode_batch([p_nat], img[None], resize_wh=(128, 64))
    p_pil = str(tmp_path / "p.jpg")
    Image.fromarray(img).resize((128, 64), Image.BICUBIC).save(p_pil)
    got = np.asarray(Image.open(p_nat)).astype(np.float64)
    want = np.asarray(Image.open(p_pil)).astype(np.float64)
    assert got.shape == want.shape
    assert np.abs(got - want).mean() < 8.0


def test_encode_pal8_matches_colorize_prediction(tmp_path):
    from thermal_semantic_segmentation_tpu.data.palette import (
        colorize_prediction, freiburg_palette)

    rng = np.random.default_rng(7)
    idx = rng.integers(0, 13, (2, 20, 30)).astype(np.uint8)
    paths = [str(tmp_path / f"c_{i}.png") for i in range(2)]
    pal = np.asarray(freiburg_palette(), np.uint8).reshape(-1, 3)
    nl.encode_pal8_batch(paths, idx, pal)
    for i, p in enumerate(paths):
        got = Image.open(p)
        assert got.mode == "P"
        want = colorize_prediction(idx[i])
        np.testing.assert_array_equal(np.asarray(got.convert("RGB")),
                                      np.asarray(want.convert("RGB")))


def test_pseudo_native_write_matches_pil(tmp_path):
    """generate_pseudo_labels(native_encode=True) writes the same artifacts
    (decoded content) as the PIL path."""
    import jax
    from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab
    from thermal_semantic_segmentation_tpu.train.pseudo import generate_pseudo_labels

    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=1, layers=(1, 1, 1, 1),
                                      image_size=(32, 64))
    rng = np.random.default_rng(8)

    class FakeLoader(list):
        pass

    batches = [{"image": rng.uniform(0, 1, (2, 32, 64, 1)).astype(np.float32),
                "img_path": [f"im_{i}_{k}.png" for k in range(2)]}
               for i in range(2)]
    for native, sub in [(False, "pil"), (True, "nat")]:
        generate_pseudo_labels(model, variables, FakeLoader(batches),
                               save_path=str(tmp_path / sub),
                               native_encode=native)
    for i in range(2):
        for k in range(2):
            name = f"im_{i}_{k}"
            a = np.asarray(Image.open(tmp_path / "pil" / f"{name}.png"))
            b = np.asarray(Image.open(tmp_path / "nat" / f"{name}.png"))
            np.testing.assert_array_equal(a, b)
            ca = Image.open(tmp_path / "pil" / f"{name}_color.png")
            cb = Image.open(tmp_path / "nat" / f"{name}_color.png")
            assert ca.mode == cb.mode == "P"
            np.testing.assert_array_equal(np.asarray(ca.convert("RGB")),
                                          np.asarray(cb.convert("RGB")))
            np.testing.assert_array_equal(
                np.load(tmp_path / "pil" / f"{name}_conf.npy"),
                np.load(tmp_path / "nat" / f"{name}_conf.npy"))
