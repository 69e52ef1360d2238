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
