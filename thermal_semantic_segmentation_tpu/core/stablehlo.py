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


def export_seg_forward(model, variables, *, label_hw: Tuple[int, int] = HW,
                       channels: int = 1, batch: Optional[int] = None,
                       output: str = "ids",
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
      platforms: lowering targets recorded in the artifact.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..ops.resize import upsample_logits

    if output not in ("ids", "logits"):
        raise ValueError(f"output must be 'ids' or 'logits', got {output!r}")

    def forward(images):
        out = model.apply(variables, images, train=False)
        logits = upsample_logits(out["out"], *label_hw)
        if output == "ids":
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return logits.astype(jnp.float32)

    if batch is None:
        b, = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, *label_hw, channels), jnp.float32)
    return jexport.export(jax.jit(forward), platforms=list(platforms))(spec)


def export_generator_forward(model, variables, *, hw: Tuple[int, int] = HW,
                             channels: int = 3, batch: Optional[int] = None,
                             platforms: Sequence[str] = ("tpu", "cpu")):
    """Export a GAN generator (normalized image in, tanh image out) — a
    deployable offline/online translator (reference translator.py's model,
    completed in cli/translator.py). Same artifact contract as
    :func:`export_seg_forward`: weights baked in, optional symbolic batch."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def forward(images):
        out = model.apply(variables, images, train=False, mutable=False)
        return out.astype(jnp.float32)

    if batch is None:
        b, = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, *hw, channels), jnp.float32)
    return jexport.export(jax.jit(forward), platforms=list(platforms))(spec)


def save_exported(exported, path: str, meta: Optional[dict] = None) -> dict:
    """Serialize an Exported to ``path`` with a ``<path>.json`` sidecar
    describing the calling convention (shapes, dtypes, platforms)."""
    import jax

    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    sidecar = {
        "format": "jax.export serialized StableHLO",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "input": [{"shape": [str(d) for d in a.shape], "dtype": str(a.dtype)}
                  for a in exported.in_avals],
        "output": [{"shape": [str(d) for d in a.shape], "dtype": str(a.dtype)}
                   for a in exported.out_avals],
        "bytes": len(blob),
        **(meta or {}),
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    return sidecar


def load_exported(path: str):
    """Deserialize an artifact written by :func:`save_exported`.

    Returns the ``jax.export.Exported``; run it with ``.call(images)``."""
    from jax import export as jexport

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
    generator artifacts; raises beyond ``tol``)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from ..ops.resize import upsample_logits

    back = jexport.deserialize(exported.serialize())
    n = batch or 3  # any size exercises a symbolic batch
    lo = -1 if output == "image" else 0  # generators eat normalized pixels
    x = np.random.default_rng(0).uniform(
        lo, 1, size=(n, *label_hw, channels)).astype(np.float32)
    got = np.asarray(back.call(x))
    if output == "image":
        ref = np.asarray(model.apply(variables, jnp.asarray(x), train=False,
                                     mutable=False), dtype=np.float32)
        diff = float(np.max(np.abs(got - ref)))
        if diff > tol:
            raise AssertionError(f"exported generator diverges from the "
                                 f"direct forward: max abs diff {diff:.3e}")
        return diff
    out = model.apply(variables, jnp.asarray(x), train=False)
    logits = upsample_logits(out["out"], *label_hw)
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
    return float(np.max(np.abs(got - ref)))


def _default_artifact_name(checkpoint_name: str, output: str) -> str:
    stem = os.path.splitext(os.path.basename(checkpoint_name))[0]
    return f"{stem}_{output}.stablehlo"
