"""ctypes bindings for the native C++ batch decoder (native/tss_io.cpp).

Decodes whole batches of PNG/JPEG images in a C++ thread pool (GIL released
for the duration of the call): 16-bit IR frames come back window-normalized
float32, RGB frames as uint8 — the hot-loop replacement for per-sample PIL
decode. The shared library is compiled on first use if missing; every entry
point degrades gracefully to the PIL path when the toolchain is unavailable
(``available()`` reports the state).

Resize note: the native fast path resizes with plain bilinear sampling; the
reference's PIL BICUBIC is kept as the bit-parity path in data/freiburg.py.

Measured here: single-image 16-bit PNG decode is at PIL parity (~14 ms for
320x960 — both zlib-bound). The thread-pool fan-out cannot be demonstrated in
this build environment (1 vCPU); on a multi-core host the batch call scales
with cores while PIL stays serial per worker process.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "tss_io.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libtss_io.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-lpng", "-ljpeg", "-lz", "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = (os.path.exists(_LIB) and os.path.exists(_SRC)
             and os.path.getmtime(_SRC) > os.path.getmtime(_LIB))
    if (not os.path.exists(_LIB) or stale) and not _build():
        if not os.path.exists(_LIB):
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.tss_decode_ir_batch.restype = ctypes.c_int
    lib.tss_decode_ir_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.tss_decode_rgb_batch.restype = ctypes.c_int
    lib.tss_decode_rgb_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.tss_decode_raw.restype = ctypes.c_int
    lib.tss_decode_raw.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.tss_encode_batch.restype = ctypes.c_int
    lib.tss_encode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.tss_encode_pal8_batch.restype = ctypes.c_int
    lib.tss_encode_pal8_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_ir_batch(paths: Sequence[str], *, resize_wh=(960, 320),
                    crop=(150, 850), window=(21800.0, 25000.0),
                    n_threads: int = 8) -> np.ndarray:
    """-> float32 (N, H, crop_w, 1) in [0, 1] (freiburg IR semantics)."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    n = len(paths)
    w, h = resize_wh
    crop_w = crop[1] - crop[0]
    out = np.empty((n, h, crop_w), np.float32)
    ok = lib.tss_decode_ir_batch(
        _paths_array(paths), n, w, h, crop[0], crop[1],
        ctypes.c_float(window[0]), ctypes.c_float(window[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if ok != n:
        raise IOError(f"native decoder failed on {n - ok}/{n} images")
    return out[..., None]


def decode_rgb_batch(paths: Sequence[str], *, resize_wh=(960, 320),
                     crop=(150, 850), n_threads: int = 8) -> np.ndarray:
    """-> uint8 (N, H, crop_w, 3)."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    n = len(paths)
    w, h = resize_wh
    crop_w = crop[1] - crop[0]
    out = np.empty((n, h, crop_w, 3), np.uint8)
    ok = lib.tss_decode_rgb_batch(
        _paths_array(paths), n, w, h, crop[0], crop[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    if ok != n:
        raise IOError(f"native decoder failed on {n - ok}/{n} images")
    return out


def encode_batch(paths: Sequence[str], images: np.ndarray, *,
                 resize_wh: Optional[tuple] = None, quality: int = 75,
                 n_threads: int = 8) -> None:
    """Write ``images`` (uint8, (N, H, W, C) or (N, H, W)) to ``paths``.

    One C++ call: optional PIL-BICUBIC-equivalent resize to (w, h), then
    JPEG (.jpg/.jpeg, libjpeg at ``quality`` — PIL's default 75) or PNG per
    path suffix, fanned over a thread pool. The translator's per-image
    ``PIL resize + save`` loop (reference translator.py is truncated there;
    cli/translator.py completes it) as a batch operation.
    """
    lib = _load()
    assert lib is not None, "native encoder unavailable"
    if images.ndim == 3:
        images = images[..., None]
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    assert n == len(paths) and c in (1, 3), (images.shape, len(paths))
    out_w, out_h = resize_wh if resize_wh is not None else (0, 0)
    ok = lib.tss_encode_batch(
        _paths_array(paths), images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, out_w, out_h, quality, n_threads)
    if ok != n:
        raise IOError(f"native encoder failed on {n - ok}/{n} images")


def encode_pal8_batch(paths: Sequence[str], indices: np.ndarray,
                      palette: np.ndarray, *, n_threads: int = 8) -> None:
    """Write index maps (uint8, (N, H, W)) as P-mode PNGs with ``palette``
    ((n_colors, 3) uint8 RGB) — the colored pseudo-label dump format."""
    lib = _load()
    assert lib is not None, "native encoder unavailable"
    indices = np.ascontiguousarray(indices, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    n, h, w = indices.shape
    assert n == len(paths) and palette.ndim == 2 and palette.shape[1] == 3
    ok = lib.tss_encode_pal8_batch(
        _paths_array(paths),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        palette.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        palette.shape[0], n_threads)
    if ok != n:
        raise IOError(f"native encoder failed on {n - ok}/{n} images")


def decode_raw(path: str, max_pixels: int = 64 << 20) -> np.ndarray:
    """Decode one image at native size (uint16 (H, W, C)); parity-test hook."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    buf = np.empty(max_pixels, np.uint16)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = lib.tss_decode_raw(path.encode(),
                           buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                           buf.size, ctypes.byref(w), ctypes.byref(h))
    if c <= 0:
        raise IOError(f"native decode failed: {path}")
    return buf[: w.value * h.value * c].reshape(h.value, w.value, c).copy()
