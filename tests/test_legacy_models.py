"""Legacy (ASPP_V2) DeepLab parity vs the reference torch models + triple transforms."""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from thermal_semantic_segmentation_tpu.models.factory import (  # noqa: E402
    deeplabv2_resnet101, deeplabv2_resnet101_thermal)
from thermal_semantic_segmentation_tpu.models.torch_convert import (  # noqa: E402
    torch_legacy_state_dict_to_flax)


def _load_ref(path, name):
    # torchvision is absent in this environment; the oracle only imports
    # torchvision.models.utils.load_state_dict_from_url (never called here) —
    # shim the whole chain with stub modules.
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        shim = types.ModuleType("torchvision.models.utils")
        shim.load_state_dict_from_url = torch.hub.load_state_dict_from_url
        tv.models = tvm
        tvm.utils = shim
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models.utils"] = shim
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _build_ref_thermal():
    """Reference 1-channel legacy model, no URL download."""
    mod = _load_ref("/root/reference/models/thermal_semantic_segmentation_models.py",
                    "_ref_thermal")
    backbone = mod.ResNet(mod.Bottleneck, [3, 4, 23, 3])
    classifier = mod.ASPP_V2(2048, [6, 12, 18, 24], [6, 12, 18, 24], 19)
    return mod.Deeplab(backbone, classifier, 19, with_feat=True)


@pytest.mark.slow
def test_legacy_thermal_parity():
    torch.manual_seed(0)
    model_t = _build_ref_thermal()
    for m in model_t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)
    model_t.eval()

    x = np.random.default_rng(0).uniform(0, 1, (1, 1, 65, 129)).astype(np.float32)
    with torch.no_grad():
        want_logits, want_feat = model_t(torch.from_numpy(x))

    variables = torch_legacy_state_dict_to_flax(model_t.state_dict())
    model = deeplabv2_resnet101_thermal(num_classes=19)
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got["out"]),
                               want_logits.numpy().transpose(0, 2, 3, 1),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got["feat"]),
                               want_feat.numpy().transpose(0, 2, 3, 1),
                               rtol=0, atol=5e-4)


def test_legacy_rgb_factory_shapes():
    import jax
    model = deeplabv2_resnet101(num_classes=19)
    variables = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, train=False),
        jax.random.key(0), jax.ShapeDtypeStruct((1, 64, 128, 3), jnp.float32))
    assert "layer5" in variables["params"]


def test_triple_transforms_alignment():
    from PIL import Image
    from thermal_semantic_segmentation_tpu.data import triple_transforms as TT

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8).astype(np.uint8))
    lab = Image.fromarray(rng.integers(0, 13, (64, 96), np.uint8).astype(np.uint8), "L")
    pipeline = TT.TripleCompose([
        TT.RandomResizedCrop(size=(32, 64), ratio=(1.5, 8 / 3.), scale=(0.5, 1.0)),
        TT.RandomHorizontalFlip(),
        TT.ToArray(),
        TT.GeneralNormalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ])
    # contour == image: the transformed triple must keep them identical
    out_img, out_lab, out_con = pipeline(np.random.default_rng(7), img, lab,
                                         img.copy())
    assert out_img.shape == (32, 64, 3) and out_con.shape == (32, 64, 3)
    np.testing.assert_array_equal(out_img, out_con)
    assert out_lab.shape == (32, 64)


def test_general_normalize_degrades_for_single_channel():
    from thermal_semantic_segmentation_tpu.data.triple_transforms import GeneralNormalize
    gn = GeneralNormalize((0.5, 0.4, 0.3), (0.5, 0.4, 0.3))
    one_ch = np.full((4, 4, 1), 1.0, np.float32)
    out, _, _ = gn(None, one_ch)
    np.testing.assert_allclose(out, (1.0 - 0.5) / 0.5)
