"""Convert reference PyTorch DeepLabV2 checkpoints to flax variables.

The reference saves checkpoints as ``{'sem_net_state_dict': state_dict, ...}``
(segmentation_train.py:186-190). This module maps that state_dict onto the
flax ``DeepLabV2`` variable tree so existing trained checkpoints keep working
and so tests can assert forward-pass numeric parity against torch.

Weight layout transforms:
  conv   (O, I, kh, kw) -> (kh, kw, I, O)
  linear (O, I)        -> (I, O)
  BatchNorm weight/bias -> scale/bias;  running_mean/var -> batch_stats mean/var
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32).transpose(2, 3, 1, 0)


def _lin_w(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32).T


def _f32(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _set(tree: Dict, path, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def torch_state_dict_to_flax(state_dict: Mapping[str, "object"]) -> Dict:
    """Return ``{'params': ..., 'batch_stats': ...}`` for ``DeepLabV2``.

    ``state_dict`` values may be torch tensors or numpy arrays.
    """
    params: Dict = {}
    stats: Dict = {}

    def put_bn(prefix_path, torch_prefix, sd):
        _set(params, prefix_path + ("scale",), _f32(sd[torch_prefix + ".weight"]))
        _set(params, prefix_path + ("bias",), _f32(sd[torch_prefix + ".bias"]))
        _set(stats, prefix_path + ("mean",), _f32(sd[torch_prefix + ".running_mean"]))
        _set(stats, prefix_path + ("var",), _f32(sd[torch_prefix + ".running_var"]))

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}

    handled = set()

    def claim(key):
        handled.add(key)
        return sd[key]

    # --- stem ---
    _set(params, ("backbone", "conv1", "kernel"), _conv_w(claim("conv1.weight")))
    put_bn(("backbone", "bn1"), "bn1", sd)
    handled.update({"bn1.weight", "bn1.bias", "bn1.running_mean", "bn1.running_var"})

    # --- bottleneck stages ---
    block_re = re.compile(r"^layer([1-4])\.(\d+)\.(.+)$")
    for key in list(sd):
        m = block_re.match(key)
        if not m:
            continue
        stage, block, rest = m.group(1), m.group(2), m.group(3)
        mod = ("backbone", f"layer{stage}_{block}")
        if rest.startswith("conv") and rest.endswith(".weight"):
            conv = rest.split(".")[0]
            _set(params, mod + (conv, "kernel"), _conv_w(claim(key)))
        elif rest.startswith("bn") and rest.endswith(".weight"):
            bn = rest.split(".")[0]
            put_bn(mod + (f"{bn}",), f"layer{stage}.{block}.{bn}", sd)
            for suf in (".weight", ".bias", ".running_mean", ".running_var"):
                handled.add(f"layer{stage}.{block}.{bn}{suf}")
        elif rest == "downsample.0.weight":
            _set(params, mod + ("downsample_conv", "kernel"), _conv_w(claim(key)))
        elif rest == "downsample.1.weight":
            put_bn(mod + ("downsample_bn",), f"layer{stage}.{block}.downsample.1", sd)
            for suf in (".weight", ".bias", ".running_mean", ".running_var"):
                handled.add(f"layer{stage}.{block}.downsample.1{suf}")

    # --- optional bn_clr ---
    if "bn_pretrain.weight" in sd:
        put_bn(("bn_pretrain",), "bn_pretrain", sd)
        handled.update({f"bn_pretrain.{s}" for s in
                        ("weight", "bias", "running_mean", "running_var")})

    # --- Classifier_Module2 head ---
    for i in range(5):
        base = f"layer5.conv2d_list.{i}"
        if f"{base}.0.weight" not in sd:
            continue
        _set(params, ("layer5", f"branch{i}_conv", "kernel"), _conv_w(claim(f"{base}.0.weight")))
        _set(params, ("layer5", f"branch{i}_conv", "bias"), _f32(claim(f"{base}.0.bias")))
        _set(params, ("layer5", f"branch{i}_gn", "scale"), _f32(claim(f"{base}.1.weight")))
        _set(params, ("layer5", f"branch{i}_gn", "bias"), _f32(claim(f"{base}.1.bias")))
    if "layer5.bottleneck.0.se.0.weight" in sd:  # SE variant
        _set(params, ("layer5", "se", "fc1", "kernel"), _lin_w(claim("layer5.bottleneck.0.se.0.weight")))
        _set(params, ("layer5", "se", "fc1", "bias"), _f32(claim("layer5.bottleneck.0.se.0.bias")))
        _set(params, ("layer5", "se", "fc2", "kernel"), _lin_w(claim("layer5.bottleneck.0.se.2.weight")))
        _set(params, ("layer5", "se", "fc2", "bias"), _f32(claim("layer5.bottleneck.0.se.2.bias")))
        conv_idx, gn_idx = 1, 2
    else:
        conv_idx, gn_idx = 0, 1
    if f"layer5.bottleneck.{conv_idx}.weight" in sd:
        _set(params, ("layer5", "bottleneck_conv", "kernel"),
             _conv_w(claim(f"layer5.bottleneck.{conv_idx}.weight")))
        _set(params, ("layer5", "bottleneck_conv", "bias"),
             _f32(claim(f"layer5.bottleneck.{conv_idx}.bias")))
        _set(params, ("layer5", "bottleneck_gn", "scale"),
             _f32(claim(f"layer5.bottleneck.{gn_idx}.weight")))
        _set(params, ("layer5", "bottleneck_gn", "bias"),
             _f32(claim(f"layer5.bottleneck.{gn_idx}.bias")))
    if "layer5.head.1.weight" in sd:
        _set(params, ("layer5", "head_conv", "kernel"), _conv_w(claim("layer5.head.1.weight")))

    leftover = [k for k in sd if k not in handled and "num_batches_tracked" not in k]
    if leftover:
        raise ValueError(f"unconverted torch keys: {leftover[:10]}")
    return {"params": params, "batch_stats": stats}


def torch_legacy_state_dict_to_flax(state_dict: Mapping[str, "object"]) -> Dict:
    """Convert a legacy-model state_dict (semantic_segmentation_models.py /
    thermal_semantic_segmentation_models.py layout: 'backbone.*' +
    'classifier.conv2d_list.{i}.*') to ``DeepLabV2(head='legacy')`` variables."""
    params: Dict = {}
    stats: Dict = {}
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}

    def put_bn(prefix_path, torch_prefix):
        _set(params, prefix_path + ("scale",), _f32(sd[torch_prefix + ".weight"]))
        _set(params, prefix_path + ("bias",), _f32(sd[torch_prefix + ".bias"]))
        _set(stats, prefix_path + ("mean",), _f32(sd[torch_prefix + ".running_mean"]))
        _set(stats, prefix_path + ("var",), _f32(sd[torch_prefix + ".running_var"]))

    _set(params, ("backbone", "conv1", "kernel"), _conv_w(sd["backbone.conv1.weight"]))
    put_bn(("backbone", "bn1"), "backbone.bn1")
    block_re = re.compile(r"^backbone\.layer([1-4])\.(\d+)\.(.+)$")
    for key in sd:
        m = block_re.match(key)
        if not m:
            continue
        stage, block, rest = m.groups()
        mod = ("backbone", f"layer{stage}_{block}")
        if rest.startswith("conv") and rest.endswith(".weight"):
            _set(params, mod + (rest.split(".")[0], "kernel"), _conv_w(sd[key]))
        elif rest.startswith("bn") and rest.endswith(".weight"):
            bn = rest.split(".")[0]
            put_bn(mod + (bn,), f"backbone.layer{stage}.{block}.{bn}")
        elif rest == "downsample.0.weight":
            _set(params, mod + ("downsample_conv", "kernel"), _conv_w(sd[key]))
        elif rest == "downsample.1.weight":
            put_bn(mod + ("downsample_bn",),
                   f"backbone.layer{stage}.{block}.downsample.1")
    for i in range(4):
        base = f"classifier.conv2d_list.{i}"
        if f"{base}.weight" not in sd:
            continue
        _set(params, ("layer5", f"branch{i}_conv", "kernel"), _conv_w(sd[f"{base}.weight"]))
        _set(params, ("layer5", f"branch{i}_conv", "bias"), _f32(sd[f"{base}.bias"]))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# GAN net converters — reference checkpoints store torch state_dicts under
# {'net_g_s2t_state_dict', 'net_d_t_state_dict', ...} (main.py:128-136,
# main_gan.py:110-114). Each net's layout is described once as a table of
# (torch_prefix, flax_path, kind) entries, used for both directions.
# ---------------------------------------------------------------------------


def _convT_w(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, I, O), spatially flipped (lax.conv_transpose correlates
    where torch's transposed conv convolves)."""
    return np.ascontiguousarray(
        np.asarray(w, np.float32).transpose(2, 3, 0, 1)[::-1, ::-1])


def _convT_back(k) -> np.ndarray:
    return np.ascontiguousarray(
        np.asarray(k)[::-1, ::-1].transpose(2, 3, 0, 1))


def _unet_layout(num_downs: int, norm: str = "batch"):
    """(torch_prefix, flax_path, kind) for UnetGenerator. Torch Sequential
    indices follow UnetSkipConnectionBlock (models/generators.py:166-235):
    outermost [downconv 0, sub 1, relu 2, upconv 3, tanh 4]; intermediate
    [relu 0, downconv 1, downnorm 2, sub 3, relu 4, upconv 5, upnorm 6];
    innermost [relu 0, downconv 1, relu 2, upconv 3, upnorm 4]."""
    batch = norm == "batch"
    entries = [("model.model.0", ("down0",), "conv"),
               ("model.model.3", ("up0",), "convT")]
    pfx = "model.model.1"
    for d in range(1, num_downs):
        inner = d == num_downs - 1
        entries.append((f"{pfx}.model.1", (f"down{d}",), "conv"))
        if not inner and batch:
            entries.append((f"{pfx}.model.2", (f"down{d}_norm",), "norm"))
        up_i = 3 if inner else 5
        entries.append((f"{pfx}.model.{up_i}", (f"up{d}",), "convT"))
        if batch:
            entries.append((f"{pfx}.model.{up_i + 1}", (f"up{d}_norm",), "norm"))
        pfx += ".model.3"
    return entries


def _patchgan_layout(n_layers: int = 3, norm: str = "batch"):
    """NLayerDiscriminator Sequential indices (models/discriminators.py:12-55):
    conv 0, then per n: conv 3n-1 / norm 3n / relu 3n+1, head at 3n_layers+2."""
    batch = norm == "batch"
    entries = [("model.0", ("conv0",), "conv")]
    for n in range(1, n_layers + 1):
        entries.append((f"model.{3 * n - 1}", (f"conv{n}",), "conv"))
        if batch:
            entries.append((f"model.{3 * n}", (f"norm{n}",), "norm"))
    entries.append((f"model.{3 * n_layers + 2}", ("head",), "conv"))
    return entries


def _resnet_gen_layout(n_blocks: int, norm: str = "batch",
                       use_dropout: bool = False,
                       padding_type: str = "reflect"):
    """ResnetGenerator Sequential indices (models/generators.py:74-133):
    [pad 0, stem 1, norm 2, relu 3], downs at 4+3i, blocks, ups, pad, head."""
    batch = norm == "batch"
    entries = [("model.1", ("stem",), "conv")]
    if batch:
        entries.append(("model.2", ("stem_norm",), "norm"))
    idx = 4
    for d in range(2):
        entries.append((f"model.{idx}", (f"down{d}",), "conv"))
        if batch:
            entries.append((f"model.{idx + 1}", (f"down{d}_norm",), "norm"))
        idx += 3
    pad_layers = padding_type in ("reflect", "replicate")
    for bi in range(n_blocks):
        base = f"model.{idx + bi}.conv_block"
        j = 1 if pad_layers else 0
        entries.append((f"{base}.{j}", (f"block{bi}", "conv1"), "conv"))
        if batch:
            entries.append((f"{base}.{j + 1}", (f"block{bi}", "norm1"), "norm"))
        j2 = j + 3 + (1 if use_dropout else 0) + (1 if pad_layers else 0)
        entries.append((f"{base}.{j2}", (f"block{bi}", "conv2"), "conv"))
        if batch:
            entries.append((f"{base}.{j2 + 1}", (f"block{bi}", "norm2"), "norm"))
    idx += n_blocks
    for u in range(2):
        entries.append((f"model.{idx}", (f"up{u}",), "convT"))
        if batch:
            entries.append((f"model.{idx + 1}", (f"up{u}_norm",), "norm"))
        idx += 3
    entries.append((f"model.{idx + 1}", ("head",), "conv"))  # after pad at idx
    return entries


def _torch_modules_to_flax(entries, state_dict) -> Dict:
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}
    handled = set()
    for tp, path, kind in entries:
        w, b = f"{tp}.weight", f"{tp}.bias"
        if kind in ("conv", "convT"):
            _set(params, path + ("kernel",),
                 (_conv_w if kind == "conv" else _convT_w)(sd[w]))
            handled.add(w)
            if b in sd:
                _set(params, path + ("bias",), _f32(sd[b]))
                handled.add(b)
        else:  # norm (BatchNorm: affine + running stats)
            _set(params, path + ("scale",), _f32(sd[w]))
            _set(params, path + ("bias",), _f32(sd[b]))
            _set(stats, path + ("mean",), _f32(sd[f"{tp}.running_mean"]))
            _set(stats, path + ("var",), _f32(sd[f"{tp}.running_var"]))
            handled.update({w, b, f"{tp}.running_mean", f"{tp}.running_var"})
    leftover = [k for k in sd if k not in handled and "num_batches_tracked" not in k]
    if leftover:
        raise ValueError(f"unconverted torch keys: {leftover[:10]}")
    return {"params": params, "batch_stats": stats}


def _flax_modules_to_torch(entries, variables) -> Dict[str, np.ndarray]:
    def get(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for tp, path, kind in entries:
        if kind in ("conv", "convT"):
            node = get(params, path)
            back = _conv_back if kind == "conv" else _convT_back
            out[f"{tp}.weight"] = back(node["kernel"])
            if "bias" in node:
                out[f"{tp}.bias"] = np.asarray(node["bias"])
        else:
            node = get(params, path)
            out[f"{tp}.weight"] = np.asarray(node["scale"])
            out[f"{tp}.bias"] = np.asarray(node["bias"])
            snode = get(stats, path)
            out[f"{tp}.running_mean"] = np.asarray(snode["mean"])
            out[f"{tp}.running_var"] = np.asarray(snode["var"])
    return out


def _conv_back(k) -> np.ndarray:
    return np.asarray(k).transpose(3, 2, 0, 1)


def infer_unet_num_downs(state_dict) -> int:
    """Nesting depth of the recursive UnetSkipConnectionBlock chain."""
    return max(k.count(".model.") for k in state_dict)


def torch_unet_state_dict_to_flax(state_dict, *, num_downs: int | None = None,
                                  norm: str = "batch") -> Dict:
    if num_downs is None:
        num_downs = infer_unet_num_downs(state_dict)
    return _torch_modules_to_flax(_unet_layout(num_downs, norm), state_dict)


def unet_flax_to_torch_state_dict(variables, *, num_downs: int = 8,
                                  norm: str = "batch") -> Dict[str, np.ndarray]:
    return _flax_modules_to_torch(_unet_layout(num_downs, norm), variables)


def torch_patchgan_state_dict_to_flax(state_dict, *, n_layers: int = 3,
                                      norm: str = "batch") -> Dict:
    return _torch_modules_to_flax(_patchgan_layout(n_layers, norm), state_dict)


def patchgan_flax_to_torch_state_dict(variables, *, n_layers: int = 3,
                                      norm: str = "batch") -> Dict[str, np.ndarray]:
    return _flax_modules_to_torch(_patchgan_layout(n_layers, norm), variables)


def torch_resnet_generator_state_dict_to_flax(
        state_dict, *, n_blocks: int, norm: str = "batch",
        use_dropout: bool = False, padding_type: str = "reflect") -> Dict:
    return _torch_modules_to_flax(
        _resnet_gen_layout(n_blocks, norm, use_dropout, padding_type), state_dict)


def resnet_generator_flax_to_torch_state_dict(
        variables, *, n_blocks: int, norm: str = "batch",
        use_dropout: bool = False, padding_type: str = "reflect") -> Dict[str, np.ndarray]:
    return _flax_modules_to_torch(
        _resnet_gen_layout(n_blocks, norm, use_dropout, padding_type), variables)


def torch_gan_checkpoint_to_flax(ckpt: Mapping, *, norm: str = "batch",
                                 n_layers: int = 3) -> Dict:
    """Reference GAN checkpoint (main.py:128-136 / main_gan.py:110-114 keys)
    -> the native {'epoch', 'g_vars', 'd_vars', 'sem_vars'} layout used by
    cli/main.py. Generator state_dicts are assumed UNet (the reference GAN
    recipe uses unet_256, main.py:76-77); the frozen legacy sem nets, when
    present, convert via torch_legacy_state_dict_to_flax."""
    out: Dict = {"epoch": int(ckpt["epoch"]), "g_vars": {}, "d_vars": {}}
    for key, name in (("net_g_s2t_state_dict", "s2t"),
                      ("net_g_t2s_state_dict", "t2s")):
        if key in ckpt:
            out["g_vars"][name] = torch_unet_state_dict_to_flax(ckpt[key], norm=norm)
    for key, name in (("net_d_t_state_dict", "t"), ("net_d_s_state_dict", "s")):
        if key in ckpt:
            out["d_vars"][name] = torch_patchgan_state_dict_to_flax(
                ckpt[key], n_layers=n_layers, norm=norm)
    sem = {}
    for key, name in (("net_seg_s_state_dict", "s"), ("net_seg_t_state_dict", "t")):
        if key in ckpt:
            sem[name] = torch_legacy_state_dict_to_flax(ckpt[key])
    if sem:
        out["sem_vars"] = sem
    return out


def flax_gan_checkpoint_to_torch(ckpt: Mapping, *, norm: str = "batch",
                                 n_layers: int = 3, num_downs: int = 8) -> Dict:
    """Inverse: export the native GAN checkpoint back to the reference keys."""
    out: Dict = {"epoch": int(ckpt["epoch"])}
    for name, key in (("s2t", "net_g_s2t_state_dict"),
                      ("t2s", "net_g_t2s_state_dict")):
        if name in ckpt.get("g_vars", {}):
            out[key] = unet_flax_to_torch_state_dict(
                ckpt["g_vars"][name], num_downs=num_downs, norm=norm)
    for name, key in (("t", "net_d_t_state_dict"), ("s", "net_d_s_state_dict")):
        if name in ckpt.get("d_vars", {}):
            out[key] = patchgan_flax_to_torch_state_dict(
                ckpt["d_vars"][name], n_layers=n_layers, norm=norm)
    return out


def flax_to_torch_state_dict(variables: Mapping) -> Dict[str, np.ndarray]:
    """Inverse map, for exporting checkpoints back to the reference layout."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    def conv_back(k):
        return np.asarray(k).transpose(3, 2, 0, 1)

    def walk_bn(torch_prefix, ppath, spath):
        out[torch_prefix + ".weight"] = np.asarray(ppath["scale"])
        out[torch_prefix + ".bias"] = np.asarray(ppath["bias"])
        out[torch_prefix + ".running_mean"] = np.asarray(spath["mean"])
        out[torch_prefix + ".running_var"] = np.asarray(spath["var"])

    bb, bbs = params["backbone"], stats.get("backbone", {})
    out["conv1.weight"] = conv_back(bb["conv1"]["kernel"])
    walk_bn("bn1", bb["bn1"], bbs["bn1"])
    for name, mod in bb.items():
        m = re.match(r"layer(\d)_(\d+)$", name)
        if not m:
            continue
        tp = f"layer{m.group(1)}.{m.group(2)}"
        for conv in ("conv1", "conv2", "conv3"):
            out[f"{tp}.{conv}.weight"] = conv_back(mod[conv]["kernel"])
        for bn in ("bn1", "bn2", "bn3"):
            walk_bn(f"{tp}.{bn}", mod[bn], bbs[name][bn])
        if "downsample_conv" in mod:
            out[f"{tp}.downsample.0.weight"] = conv_back(mod["downsample_conv"]["kernel"])
            walk_bn(f"{tp}.downsample.1", mod["downsample_bn"], bbs[name]["downsample_bn"])
    if "bn_pretrain" in params:
        walk_bn("bn_pretrain", params["bn_pretrain"], stats["bn_pretrain"])
    l5 = params["layer5"]
    for i in range(5):
        key = f"branch{i}_conv"
        if key not in l5:
            continue
        out[f"layer5.conv2d_list.{i}.0.weight"] = conv_back(l5[key]["kernel"])
        out[f"layer5.conv2d_list.{i}.0.bias"] = np.asarray(l5[key]["bias"])
        out[f"layer5.conv2d_list.{i}.1.weight"] = np.asarray(l5[f"branch{i}_gn"]["scale"])
        out[f"layer5.conv2d_list.{i}.1.bias"] = np.asarray(l5[f"branch{i}_gn"]["bias"])
    if "se" in l5:
        out["layer5.bottleneck.0.se.0.weight"] = np.asarray(l5["se"]["fc1"]["kernel"]).T
        out["layer5.bottleneck.0.se.0.bias"] = np.asarray(l5["se"]["fc1"]["bias"])
        out["layer5.bottleneck.0.se.2.weight"] = np.asarray(l5["se"]["fc2"]["kernel"]).T
        out["layer5.bottleneck.0.se.2.bias"] = np.asarray(l5["se"]["fc2"]["bias"])
        ci, gi = 1, 2
    else:
        ci, gi = 0, 1
    out[f"layer5.bottleneck.{ci}.weight"] = conv_back(l5["bottleneck_conv"]["kernel"])
    out[f"layer5.bottleneck.{ci}.bias"] = np.asarray(l5["bottleneck_conv"]["bias"])
    out[f"layer5.bottleneck.{gi}.weight"] = np.asarray(l5["bottleneck_gn"]["scale"])
    out[f"layer5.bottleneck.{gi}.bias"] = np.asarray(l5["bottleneck_gn"]["bias"])
    out["layer5.head.1.weight"] = conv_back(l5["head_conv"]["kernel"])
    return out
