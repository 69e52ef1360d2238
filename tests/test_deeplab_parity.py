"""Numeric parity of the flax DeepLabV2 against the reference torch model.

The reference implementation at /root/reference/models/deeplabv2.py is imported
as a black-box oracle (never copied): we randomly initialize it, convert its
state_dict with torch_convert, and require the flax forward pass to match
'out' and 'feat' to float32 tolerance.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from thermal_semantic_segmentation_tpu.models.deeplab import DeepLabV2, create_deeplab  # noqa: E402
from thermal_semantic_segmentation_tpu.models.torch_convert import (  # noqa: E402
    flax_to_torch_state_dict,
    torch_state_dict_to_flax,
)

REF = "/root/reference/models/deeplabv2.py"


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("_ref_deeplabv2", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_deeplabv2"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_torch_model():
    ref = _load_reference_module()
    torch.manual_seed(0)
    model = ref.ResNet101(ref.Bottleneck, [3, 4, 23, 3], num_classes=13,
                          BatchNorm=torch.nn.BatchNorm2d, num_channels=1,
                          get_feat=True)
    # randomize BN stats so parity covers running-stat plumbing too
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)
    model.eval()
    return model


@pytest.mark.slow
def test_forward_parity_with_reference(ref_torch_model):
    x = np.random.default_rng(0).uniform(0, 1, size=(2, 1, 65, 129)).astype(np.float32)
    with torch.no_grad():
        want = ref_torch_model(torch.from_numpy(x))

    variables = torch_state_dict_to_flax(ref_torch_model.state_dict())
    model = DeepLabV2(num_classes=13, num_channels=1)
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    for key in ("out", "feat"):
        w = want[key].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got[key])
        assert g.shape == w.shape, (key, g.shape, w.shape)
        np.testing.assert_allclose(g, w, rtol=0, atol=5e-4)


@pytest.mark.slow
def test_roundtrip_conversion(ref_torch_model):
    sd = {k: v for k, v in ref_torch_model.state_dict().items()}
    variables = torch_state_dict_to_flax(sd)
    back = flax_to_torch_state_dict(variables)
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)


def test_init_shapes_and_feat_contract():
    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=3, image_size=(64, 128))
    x = jnp.zeros((2, 64, 128, 3))
    out = model.apply(variables, x, train=False)
    assert out["out"].shape == (2, 9, 17, 13)   # stride-8 grid of 64x128 (ceil pool)
    assert out["feat"].shape == (2, 9, 17, 256)


def test_legacy_head_shapes():
    model, variables = create_deeplab(jax.random.key(0), num_classes=13,
                                      num_channels=1, head="legacy",
                                      image_size=(64, 128))
    out = model.apply(variables, jnp.zeros((1, 64, 128, 1)), train=False)
    assert out["out"].shape == (1, 9, 17, 13)
    assert out["feat"].shape[-1] == 2048


@pytest.mark.slow
def test_reference_torch_checkpoint_through_eval_path(ref_torch_model, tmp_path):
    """The user-migration path: a reference-format .pth checkpoint loads via
    load_seg_checkpoint and produces the same predictions through our eval
    step as the torch model."""
    from thermal_semantic_segmentation_tpu.cli._common import load_seg_checkpoint
    from thermal_semantic_segmentation_tpu.train.seg import build_seg_eval_step

    path = str(tmp_path / "ref_ckpt.pth")
    torch.save({"epoch": 4, "val_loss": 0.5,
                "sem_net_state_dict": ref_torch_model.state_dict()}, path)

    variables, meta = load_seg_checkpoint(path)
    assert int(meta["epoch"]) == 4

    model = DeepLabV2(num_classes=13, num_channels=1)
    eval_step = build_seg_eval_step(model, num_classes=13, ignore_index=12,
                                    label_hw=(64, 128))
    x = np.random.default_rng(1).uniform(0, 1, (1, 1, 64, 128)).astype(np.float32)
    label = np.random.default_rng(2).integers(0, 13, (1, 64, 128))
    hist, loss, pred = eval_step(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(label))

    with torch.no_grad():
        out = ref_torch_model(torch.from_numpy(x))["out"]
        up = torch.nn.functional.interpolate(out, (64, 128), mode="bilinear",
                                             align_corners=True)
        want_pred = up.argmax(1).numpy()
    agreement = (np.asarray(pred) == want_pred).mean()
    assert agreement > 0.999, agreement
