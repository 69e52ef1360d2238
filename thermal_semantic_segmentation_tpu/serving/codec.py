"""Result encoders + the streaming wire codec (split from cli/serve.py).

Stream framing (``/segment_stream`` and ``/translate_stream``): request
bodies are ``8-byte big-endian length || image bytes`` frames; responses are
HTTP chunked, one ``1 status byte || 8-byte length || payload`` frame per
input in request order (status 0 ok, 1 bad frame, 2 inference error).
:func:`stream_segment` is the reference client.
"""

from __future__ import annotations

import io
import json
import struct

import numpy as np

from .batcher import HW


def encode_result(pred: np.ndarray, fmt: str, palette) -> tuple:
    """(H, W) uint8 class ids -> (payload bytes, content type) per ``fmt``."""
    if fmt == "json":
        ids, counts = np.unique(pred, return_counts=True)
        body = json.dumps({
            "class_counts": {int(i): int(c) for i, c in zip(ids, counts)},
            "shape": list(pred.shape)}).encode()
        return body, "application/json"
    from PIL import Image

    from ..data.palette import colorize_prediction

    buf = io.BytesIO()
    if fmt == "ids":
        Image.fromarray(pred.astype(np.uint8), mode="L").save(buf,
                                                              format="PNG")
    else:
        colorize_prediction(pred, palette).save(buf, format="PNG")
    return buf.getvalue(), "image/png"


def make_translation_fns(model, *, channels: int, normalize, denormalize,
                         hw=HW):
    """(preprocess_fn, predict_fn, encode) for serving a GAN generator —
    the online counterpart of the offline ``cli/translator.py``: same
    Normalize(m, m) input semantics and ``clip((y*d + d)*255)``
    denormalization (translator.py:36,104), micro-batched like the seg
    kind."""
    import jax
    import jax.numpy as jnp

    mean = np.asarray(normalize, np.float32)
    if channels == 1 and mean.size > 1:
        mean = mean[:1]
    denorm = np.asarray(denormalize, np.float32)

    def preprocess_fn(image_bytes: bytes) -> np.ndarray:
        from PIL import Image

        from ..data.freiburg import load_ir_image

        img = Image.open(io.BytesIO(image_bytes))
        if np.asarray(img).dtype == np.uint16:
            # 16-bit thermal input (t2s direction): the full Freiburg IR
            # radiometric window, exactly like the seg kind's preprocess —
            # a plain .convert('L') would saturate everything to white
            if channels != 1:
                raise ValueError("16-bit IR input is 1-channel")
            windowed = load_ir_image(io.BytesIO(image_bytes))
            arr = np.asarray(windowed.resize((hw[1], hw[0]), Image.BICUBIC),
                             dtype=np.float32)[..., None]
        else:
            img = img.convert("RGB" if channels == 3 else "L")
            arr = np.asarray(img.resize((hw[1], hw[0]), Image.BICUBIC),
                             dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
        if arr.shape[-1] != channels:
            raise ValueError(f"expected {channels}-channel input, got "
                             f"{arr.shape[-1]}")
        return (arr - mean) / mean

    @jax.jit
    def predict_fn(variables, images):
        out = model.apply(variables, images, train=False, mutable=False)
        # denormalize on device: uint8 is 4x fewer device->host bytes
        return jnp.clip((out * denorm + denorm) * 255.0, 0, 255
                        ).astype(jnp.uint8)

    def encode(pred: np.ndarray, fmt: str) -> tuple:
        from PIL import Image

        arr = pred[..., 0] if pred.shape[-1] == 1 else pred
        buf = io.BytesIO()
        Image.fromarray(arr, mode="L" if arr.ndim == 2 else "RGB").save(
            buf, format="PNG")
        return buf.getvalue(), "image/png"

    return preprocess_fn, predict_fn, encode


def _read_exact(fp, n: int) -> bytes:
    parts = []
    while n:
        chunk = fp.read(n)
        if not chunk:
            raise EOFError(f"stream truncated ({n} bytes short)")
        parts.append(chunk)
        n -= len(chunk)
    return b"".join(parts)


def stream_segment(url: str, images, timeout: float = 300.0):
    """Reference client for ``POST /segment_stream``.

    ``images`` is an iterable of encoded image bytes; yields
    (status, payload) per input in order — status 0 ok, 1 bad frame,
    2 inference error."""
    import urllib.request

    body = b"".join(struct.pack(">Q", len(b)) + b for b in images)
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        while True:
            head = resp.read(1)
            if not head:
                return
            (length,) = struct.unpack(">Q", _read_exact(resp, 8))
            yield head[0], _read_exact(resp, length)
