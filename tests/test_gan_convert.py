"""GAN checkpoint converters: forward parity of converted reference torch
UNet / ResNet generators and NLayerDiscriminator state_dicts, plus full
reference-layout GAN checkpoint round-trip (main.py:90-99 / :128-136 keys)."""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.models.torch_convert import (
    flax_gan_checkpoint_to_torch,
    infer_unet_num_downs,
    patchgan_flax_to_torch_state_dict,
    torch_gan_checkpoint_to_flax,
    torch_patchgan_state_dict_to_flax,
    torch_resnet_generator_state_dict_to_flax,
    torch_unet_state_dict_to_flax,
    unet_flax_to_torch_state_dict,
)
from thermal_semantic_segmentation_tpu.nn.generators import ResnetGenerator, UnetGenerator
from thermal_semantic_segmentation_tpu.nn.patchgan import NLayerDiscriminator

torch = pytest.importorskip("torch")


def _load_ref(name, path):
    """Import a reference module by path. The real reference `utils` package
    __init__ pulls in torchvision (not installed); stub the package and load
    only utils.misc, which generators.py actually needs."""
    import types
    if "utils" not in sys.modules or not getattr(
            sys.modules["utils"], "__tss_ref_stub__", False):
        pkg = types.ModuleType("utils")
        pkg.__path__ = ["/root/reference/utils"]
        pkg.__tss_ref_stub__ = True
        sys.modules["utils"] = pkg
        mspec = importlib.util.spec_from_file_location(
            "utils.misc", "/root/reference/utils/misc.py")
        misc = importlib.util.module_from_spec(mspec)
        sys.modules["utils.misc"] = misc
        mspec.loader.exec_module(misc)
        pkg.misc = misc
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_gens():
    return _load_ref("_ref_generators", "/root/reference/models/generators.py")


@pytest.fixture(scope="module")
def ref_disc():
    return _load_ref("_ref_discriminators", "/root/reference/models/discriminators.py")


def _load_back(tnet, sd_np):
    """strict load except torch's num_batches_tracked counters."""
    res = tnet.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                                for k, v in sd_np.items()}, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    real_missing = [k for k in res.missing_keys if "num_batches_tracked" not in k]
    assert not real_missing, real_missing


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _nhwc(x):
    return jnp.asarray(np.asarray(x).transpose(0, 2, 3, 1))


@pytest.mark.parametrize("num_downs,hw", [(5, (32, 64)), (8, (256, 256))])
def test_unet_converted_forward_parity(ref_gens, num_downs, hw):
    torch.manual_seed(0)
    tnet = ref_gens.UnetGenerator(input_nc=3, output_nc=1,
                                  num_downs=num_downs, ngf=4).eval()
    x = torch.randn(2, 3, *hw)
    with torch.no_grad():
        want = tnet(x).numpy()

    sd = tnet.state_dict()
    assert infer_unet_num_downs(sd) == num_downs
    variables = torch_unet_state_dict_to_flax(sd)
    fnet = UnetGenerator(output_nc=1, num_downs=num_downs, ngf=4)
    got = _nchw(fnet.apply(variables, _nhwc(x.numpy()), train=False))
    np.testing.assert_allclose(got, want, atol=5e-5)

    # inverse: back to torch layout, load strict, identical forward
    back = unet_flax_to_torch_state_dict(variables, num_downs=num_downs)
    tnet2 = ref_gens.UnetGenerator(input_nc=3, output_nc=1,
                                   num_downs=num_downs, ngf=4).eval()
    _load_back(tnet2, back)
    with torch.no_grad():
        want2 = tnet2(x).numpy()
    np.testing.assert_allclose(want2, want, atol=1e-6)


def test_patchgan_converted_forward_parity(ref_disc):
    torch.manual_seed(1)
    tnet = ref_disc.NLayerDiscriminator(input_nc=1, ndf=8, n_layers=3).eval()
    x = torch.randn(2, 1, 64, 96)
    with torch.no_grad():
        want = tnet(x).numpy()
    variables = torch_patchgan_state_dict_to_flax(tnet.state_dict())
    fnet = NLayerDiscriminator(ndf=8, n_layers=3)
    got = _nchw(fnet.apply(variables, _nhwc(x.numpy()), train=False))
    np.testing.assert_allclose(got, want, atol=5e-5)

    back = patchgan_flax_to_torch_state_dict(variables)
    _load_back(tnet, back)
    with torch.no_grad():
        np.testing.assert_allclose(tnet(x).numpy(), want, atol=1e-6)


def test_resnet_generator_converted_forward_parity(ref_gens):
    torch.manual_seed(2)
    tnet = ref_gens.ResnetGenerator(input_nc=3, output_nc=3, ngf=8,
                                    n_blocks=2).eval()
    x = torch.randn(2, 3, 32, 48)
    with torch.no_grad():
        want = tnet(x).numpy()
    variables = torch_resnet_generator_state_dict_to_flax(
        tnet.state_dict(), n_blocks=2)
    fnet = ResnetGenerator(output_nc=3, ngf=8, n_blocks=2)
    got = _nchw(fnet.apply(variables, _nhwc(x.numpy()), train=False))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_cli_loads_reference_torch_gan_checkpoint(ref_gens, ref_disc, tmp_path):
    """cli/main.py's loader falls back from native msgpack to a reference
    torch .pth (main.py:90-99 resume path) transparently."""
    from thermal_semantic_segmentation_tpu.cli.main import (
        _load_gan_checkpoint, _load_sem_variables)

    torch.manual_seed(4)
    g = ref_gens.UnetGenerator(input_nc=3, output_nc=1, num_downs=5, ngf=4)
    d = ref_disc.NLayerDiscriminator(input_nc=1, ndf=8)
    path = str(tmp_path / "ref_gan.pth")
    torch.save({"epoch": 3,
                "net_g_s2t_state_dict": g.state_dict(),
                "net_d_t_state_dict": d.state_dict()}, path)
    ckpt = _load_gan_checkpoint(path)
    assert ckpt["epoch"] == 3
    assert set(ckpt["g_vars"]) == {"s2t"} and set(ckpt["d_vars"]) == {"t"}
    assert "params" in ckpt["g_vars"]["s2t"]

    # native sem checkpoint path ({'variables': ...})
    from thermal_semantic_segmentation_tpu.core.checkpoint import save_checkpoint
    tree = {"params": {"w": np.ones((2, 2), np.float32)}}
    spath = str(tmp_path / "sem.pth")
    save_checkpoint(spath, {"variables": tree})
    out = _load_sem_variables(spath)
    np.testing.assert_array_equal(out["params"]["w"], tree["params"]["w"])


def test_gan_checkpoint_conversion_and_export(ref_gens, ref_disc):
    """A full reference-layout CycleGAN checkpoint (the main.py:128-136 keys,
    randomly-initialized oracle) converts to the native layout and exports
    back to torch with forward parity preserved."""
    torch.manual_seed(3)
    g_s2t = ref_gens.UnetGenerator(input_nc=3, output_nc=1, num_downs=5, ngf=4).eval()
    g_t2s = ref_gens.UnetGenerator(input_nc=1, output_nc=3, num_downs=5, ngf=4).eval()
    d_t = ref_disc.NLayerDiscriminator(input_nc=1, ndf=8).eval()
    d_s = ref_disc.NLayerDiscriminator(input_nc=3, ndf=8).eval()
    ckpt = {"epoch": 7,
            "net_g_s2t_state_dict": g_s2t.state_dict(),
            "net_g_t2s_state_dict": g_t2s.state_dict(),
            "net_d_t_state_dict": d_t.state_dict(),
            "net_d_s_state_dict": d_s.state_dict()}

    native = torch_gan_checkpoint_to_flax(ckpt)
    assert native["epoch"] == 7
    assert set(native["g_vars"]) == {"s2t", "t2s"}
    assert set(native["d_vars"]) == {"t", "s"}

    xs = torch.randn(1, 3, 32, 64)
    with torch.no_grad():
        want = g_s2t(xs).numpy()
    fnet = UnetGenerator(output_nc=1, num_downs=5, ngf=4)
    got = _nchw(fnet.apply(native["g_vars"]["s2t"], _nhwc(xs.numpy()), train=False))
    np.testing.assert_allclose(got, want, atol=5e-5)

    back = flax_gan_checkpoint_to_torch(native, num_downs=5)
    assert back["epoch"] == 7
    g2 = ref_gens.UnetGenerator(input_nc=3, output_nc=1, num_downs=5, ngf=4).eval()
    _load_back(g2, back["net_g_s2t_state_dict"])
    with torch.no_grad():
        np.testing.assert_allclose(g2(xs).numpy(), want, atol=1e-6)
