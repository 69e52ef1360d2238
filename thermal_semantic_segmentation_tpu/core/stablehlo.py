"""Self-contained StableHLO deployment artifacts (``jax.export``).

A deployment surface the reference lacks: serialize the full inference
function — eval-mode DeepLab forward + the protocol's align-corners logits
upsample (reference segmentation_evaluate.py:39) + argmax — into ONE portable
blob with the checkpoint's weights baked in as constants. The artifact needs
only ``jax.export.deserialize`` to run (no model code, no checkpoint, no
framework config), runs on any platform it was lowered for (TPU and CPU by
default), and its batch dimension is symbolic so one export serves any batch
size without recompiling the exporter.

Complements the other deployment paths: ``cli/serve.py`` (live HTTP
micro-batching) and ``cli/export_torch.py`` (back to reference ``.pth``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

HW = (256, 512)


def quantize_variables(variables, *, min_size: int = 4096):
    """Weight-only int8 quantization for export artifacts.

    Large float leaves (>= ``min_size`` params, >= 2-D — conv/dense kernels)
    are stored as int8 with symmetric per-output-channel scales; everything
    else (BN/GN params and stats, biases, small heads) stays float. This is
    a STORAGE format only: weights are dequantized to float once at artifact
    LOAD time and all compute stays bf16/f32 convs — int8xint8 convs through
    XLA measured 25% SLOWER than bf16 on this hardware (docs/PERFORMANCE.md),
    so quantized *compute* is deliberately not attempted. The win is the
    artifact: ~4x smaller weights for deployment distribution.

    (In-graph dequantization is NOT an option: closed-over constants are
    concrete at trace time, so any dequant math folds back to f32 constants
    before serialization — measured, the blob came out byte-for-byte the
    same size. Hence the container format: program with weights as
    arguments + int8 payload, see :func:`save_exported`.)

    Returns ``(qtree, scales, stats)``: the variables tree with quantized
    leaves replaced by int8 arrays, a ``{tree-path: scale}`` dict, and a
    stats dict for the artifact sidecar.
    """
    import numpy as np
    from jax import tree_util as jtu

    scales = {}
    stats = {"tensors": 0, "params": 0, "float_params": 0}

    def quant(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind != "f" or arr.ndim < 2 or arr.size < min_size:
            stats["float_params"] += int(arr.size)
            return leaf
        w = arr.astype(np.float32)
        s = np.max(np.abs(w), axis=tuple(range(arr.ndim - 1)),
                   keepdims=True) / 127.0
        s = np.where(s == 0, 1.0, s).astype(np.float32)
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        scales[jtu.keystr(path)] = s
        stats["tensors"] += 1
        stats["params"] += int(arr.size)
        return q

    qtree = jtu.tree_map_with_path(quant, variables)
    return qtree, scales, stats


def dequantize_variables_np(qtree, scales):
    """Rebuild float variables from :func:`quantize_variables` output, on
    the host (numpy) — the self-check reference and the load-time path, with
    no eager device ops (un-jitted op chains round-trip per op; CLAUDE.md)."""
    import numpy as np
    from jax import tree_util as jtu

    def deq(path, leaf):
        s = scales.get(jtu.keystr(path))
        return leaf if s is None else np.asarray(leaf, np.float32) * s

    return jtu.tree_map_with_path(deq, qtree)


class QuantizedArtifact:
    """An export whose weights travel as an int8 payload beside a
    weights-as-arguments program. Produced by the ``quantize='int8'`` export
    paths; :func:`save_exported` writes it as a single zip container
    (``program.bin`` + ``weights.npz``) and :func:`load_exported` transparently
    rebinds it. The program itself is checkpoint-agnostic: swapping the
    payload swaps the weights without re-exporting."""

    def __init__(self, exported, payload, n_leaves, stats):
        self.exported = exported      # signature: (images, [leaves])
        self.payload = payload        # {q{i}, s{i}} or {w{i}} per leaf
        self.n_leaves = n_leaves
        self.stats = stats
        self.platforms = exported.platforms


def _export_quantized(apply_fn, variables, image_spec, platforms,
                      quantize: str) -> "QuantizedArtifact":
    """Export ``apply_fn(vars_tree, images)`` with the weight tree as
    ARGUMENTS (closed-over constants would fold the dequant away — see
    :func:`quantize_variables`) and build the int8 payload."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport
    from jax import tree_util as jtu

    if quantize != "int8":
        raise ValueError(f"quantize must be 'int8' or None, got {quantize!r}")
    qtree, scales, stats = quantize_variables(variables)
    treedef = jtu.tree_structure(variables)
    payload, leaf_specs = {}, []
    for i, (path, leaf) in enumerate(jtu.tree_flatten_with_path(qtree)[0]):
        arr = np.asarray(leaf)
        s = scales.get(jtu.keystr(path))
        if s is not None:
            payload[f"q{i}"], payload[f"s{i}"] = arr, s
            leaf_specs.append(jax.ShapeDtypeStruct(arr.shape, jnp.float32))
        else:
            payload[f"w{i}"] = arr
            leaf_specs.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))

    def forward(images, leaves):
        return apply_fn(jtu.tree_unflatten(treedef, leaves), images)

    exported = jexport.export(jax.jit(forward), platforms=list(platforms))(
        image_spec, leaf_specs)
    return QuantizedArtifact(exported, payload, len(leaf_specs), stats)


def _payload_to_leaves(npz):
    """Dequantize a container payload back to the flat float leaf list."""
    import numpy as np

    leaves, i = [], 0
    while f"w{i}" in npz or f"q{i}" in npz:
        if f"w{i}" in npz:
            leaves.append(npz[f"w{i}"])
        else:
            leaves.append(npz[f"q{i}"].astype(np.float32) * npz[f"s{i}"])
        i += 1
    return leaves


class _BoundExported:
    """A deserialized container artifact bound to its dequantized weights;
    mirrors the subset of ``jax.export.Exported`` callers use (``.call`` on
    images alone, ``.platforms``, image-only ``in_avals``)."""

    def __init__(self, exported, leaves):
        self._exported = exported
        self._leaves = leaves
        self._device_leaves = None
        self.platforms = exported.platforms
        self.in_avals = (exported.in_avals[0],)
        self.out_avals = exported.out_avals

    def call(self, images):
        import jax

        if self._device_leaves is not None:
            return self._exported.call(images, self._device_leaves)
        if isinstance(images, jax.core.Tracer):
            # called under a trace (jit / shard_map): bind the HOST leaves —
            # they embed as constants of that program. Caching a device_put
            # issued here would cache tracers of this trace and crash any
            # later trace with UnexpectedTracerError.
            return self._exported.call(images, self._leaves)
        # eager call: one transfer, then device-resident across calls; drop
        # the host copy (~120 MB of f32 for a DeepLab) once transferred
        self._device_leaves = jax.device_put(self._leaves)
        self._leaves = None
        return self._exported.call(images, self._device_leaves)


def export_seg_forward(model, variables, *, label_hw: Tuple[int, int] = HW,
                       channels: int = 1, batch: Optional[int] = None,
                       output: str = "ids", quantize: Optional[str] = None,
                       platforms: Sequence[str] = ("tpu", "cpu")):
    """Export the eval-protocol forward as a ``jax.export.Exported``.

    Args:
      model, variables: a DeepLab module + its loaded variables (weights are
        embedded in the artifact as constants — it is self-contained).
      label_hw: protocol resolution the logits are upsampled to
        (segmentation_evaluate.py:39: bilinear align_corners).
      batch: fixed batch size, or None for a symbolic ("dynamic") batch dim.
      output: 'ids' (uint8 argmax classes, the serving payload) or 'logits'
        (float32 upsampled logits, for downstream soft use).
      quantize: 'int8' ships conv/dense kernels as an int8 + per-channel
        scale payload beside a weights-as-arguments program (storage-only;
        see :func:`quantize_variables`); returns a :class:`QuantizedArtifact`.
      platforms: lowering targets recorded in the artifact.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..ops.resize import upsample_logits

    if output not in ("ids", "logits"):
        raise ValueError(f"output must be 'ids' or 'logits', got {output!r}")

    def apply_fn(vars_tree, images):
        out = model.apply(vars_tree, images, train=False)
        logits = upsample_logits(out["out"], *label_hw)
        if output == "ids":
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return logits.astype(jnp.float32)

    if batch is None:
        b, = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, *label_hw, channels), jnp.float32)
    if quantize:
        return _export_quantized(apply_fn, variables, spec, platforms,
                                 quantize)
    return jexport.export(jax.jit(lambda x: apply_fn(variables, x)),
                          platforms=list(platforms))(spec)


def export_generator_forward(model, variables, *, hw: Tuple[int, int] = HW,
                             channels: int = 3, batch: Optional[int] = None,
                             quantize: Optional[str] = None,
                             platforms: Sequence[str] = ("tpu", "cpu")):
    """Export a GAN generator (normalized image in, tanh image out) — a
    deployable offline/online translator (reference translator.py's model,
    completed in cli/translator.py). Same artifact contract as
    :func:`export_seg_forward`: weights baked in, optional symbolic batch,
    optional int8 weight-only storage quantization."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def apply_fn(vars_tree, images):
        out = model.apply(vars_tree, images, train=False, mutable=False)
        return out.astype(jnp.float32)

    if batch is None:
        b, = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, *hw, channels), jnp.float32)
    if quantize:
        return _export_quantized(apply_fn, variables, spec, platforms,
                                 quantize)
    return jexport.export(jax.jit(lambda x: apply_fn(variables, x)),
                          platforms=list(platforms))(spec)


def save_exported(exported, path: str, meta: Optional[dict] = None) -> dict:
    """Serialize an export to ``path`` with a ``<path>.json`` sidecar
    describing the calling convention (shapes, dtypes, platforms).

    A plain ``jax.export.Exported`` becomes one raw blob. A
    :class:`QuantizedArtifact` becomes a zip container (``program.bin`` +
    ``weights.npz``); its sidecar input/output describe the IMAGE calling
    convention only (the weight arguments are internal to the container)."""
    import jax

    def _avals(avals):
        return [{"shape": [str(d) for d in a.shape], "dtype": str(a.dtype)}
                for a in avals]

    if isinstance(exported, QuantizedArtifact):
        import io
        import zipfile

        import numpy as np

        npz = io.BytesIO()
        np.savez(npz, **exported.payload)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
            z.writestr("program.bin", exported.exported.serialize())
            z.writestr("weights.npz", npz.getvalue())
        extra = {
            "container": "program+weights",
            "quantize": "int8",
            "weight_args": exported.n_leaves,
            "quantized_tensors": exported.stats["tensors"],
            "quantized_params": exported.stats["params"],
            "float_params": exported.stats["float_params"],
        }
        inner, out_avals = exported.exported, exported.exported.out_avals
        in_avals = inner.in_avals[:1]     # the image argument
    else:
        extra, out_avals, in_avals = {}, exported.out_avals, exported.in_avals
        with open(path, "wb") as f:
            f.write(exported.serialize())
    sidecar = {
        "format": "jax.export serialized StableHLO",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "input": _avals(in_avals),
        "output": _avals(out_avals),
        "bytes": os.path.getsize(path),
        **extra,
        **(meta or {}),
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    return sidecar


def load_exported(path: str):
    """Deserialize an artifact written by :func:`save_exported`.

    Raw blobs return the ``jax.export.Exported``; quantized containers
    return a bound wrapper with the same ``.call(images)`` surface (weights
    dequantized once on the host, device-put on first call). The sidecar's
    ``container`` field is the authoritative format marker; zip sniffing is
    the fallback for artifacts whose sidecar is missing."""
    import zipfile

    from jax import export as jexport

    container = None
    try:
        container = exported_sidecar(path).get("container")
    except (OSError, ValueError):
        pass
    if (container == "program+weights"
            or (container is None and zipfile.is_zipfile(path))):
        import io

        import numpy as np

        with zipfile.ZipFile(path) as z:
            exported = jexport.deserialize(z.read("program.bin"))
            with np.load(io.BytesIO(z.read("weights.npz"))) as npz:
                leaves = _payload_to_leaves(npz)
        return _BoundExported(exported, leaves)
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def exported_sidecar(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)


def _self_check(exported, channels: int, label_hw, batch: Optional[int],
                model, variables, output: str, tol: float = 1e-4) -> float:
    """Round-trip the serialized artifact and compare against the direct
    forward on random pixels. Returns the argmax-mismatch fraction ('ids';
    raises unless every mismatch is a logit near-tie), the max abs logit
    difference ('logits'), or the max abs pixel difference ('image' —
    generator artifacts; raises beyond ``tol``). A :class:`_BoundExported`
    (already loaded back from a container on disk) is checked as-is."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from ..ops.resize import upsample_logits

    back = (exported if isinstance(exported, _BoundExported)
            else jexport.deserialize(exported.serialize()))
    n = batch or 3  # any size exercises a symbolic batch
    lo = -1 if output == "image" else 0  # generators eat normalized pixels
    x = np.random.default_rng(0).uniform(
        lo, 1, size=(n, *label_hw, channels)).astype(np.float32)
    got = np.asarray(back.call(x))
    # jit the reference forward: an un-jitted apply dispatches per-op, which
    # over a tunneled TPU means minutes of round trips (CLAUDE.md)
    if output == "image":
        fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False,
                                                mutable=False))
        ref = np.asarray(fwd(variables, jnp.asarray(x)), dtype=np.float32)
        diff = float(np.max(np.abs(got - ref)))
        if diff > tol:
            raise AssertionError(f"exported generator diverges from the "
                                 f"direct forward: max abs diff {diff:.3e}")
        return diff
    fwd = jax.jit(lambda v, xx: upsample_logits(
        model.apply(v, xx, train=False)["out"], *label_hw))
    logits = fwd(variables, jnp.asarray(x))
    if output == "ids":
        ref_logits = np.asarray(logits, dtype=np.float32)
        ref = ref_logits.argmax(-1).astype(np.uint8)
        differ = got != ref
        if differ.any():
            # constant-folding the baked weights can reassociate float ops,
            # flipping argmax only on genuine logit near-ties — anything
            # beyond a near-tie is a real export bug
            lg = np.take_along_axis(ref_logits, got[..., None].astype(np.int64),
                                    -1)[..., 0]
            lr = np.take_along_axis(ref_logits, ref[..., None].astype(np.int64),
                                    -1)[..., 0]
            gap = np.abs(lr - lg)[differ]
            scale = np.abs(ref_logits).max() + 1e-30
            if gap.max() / scale > 1e-4:
                raise AssertionError(
                    f"exported ids disagree with direct forward on "
                    f"{float(differ.mean()):.3%} of pixels with relative "
                    f"logit gap up to {gap.max() / scale:.2e} (not ties)")
        return float(differ.mean())
    ref = np.asarray(logits, dtype=np.float32)
    diff = float(np.max(np.abs(got - ref)))
    # scale-relative bound: constant-folding the baked weights reassociates
    # float ops, so exact equality is unattainable — but a diff comparable
    # to the logit scale means a broken artifact, and a check that can
    # never fail is no check
    scale = float(np.abs(ref).max()) + 1e-30
    if diff / scale > tol:
        raise AssertionError(
            f"exported logits diverge from the direct forward: max abs "
            f"diff {diff:.3e} ({diff / scale:.2e} of the logit scale)")
    return diff


def _default_artifact_name(checkpoint_name: str, output: str) -> str:
    stem = os.path.splitext(os.path.basename(checkpoint_name))[0]
    return f"{stem}_{output}.stablehlo"
