"""Micro-batching inference engine (split from cli/serve.py; see that
module's docstring for the full serving surface).

:class:`InferenceServer` coalesces concurrent requests into fixed-size
padded device batches — one compiled XLA program shape — up to a latency
budget, optionally sharded over a ``jax.sharding`` mesh.
"""

from __future__ import annotations

import io
import queue
import threading

import numpy as np

from ..ops.batching import pad_rows

HW = (256, 512)


class InferenceError(RuntimeError):
    """A server-side (device/model) failure — maps to HTTP 500, while
    request decode/preprocess errors stay 400."""


def preprocess(image_bytes: bytes, hw=HW, channels: int = 1) -> np.ndarray:
    """Decode request bytes -> (H, W, channels) float32 in [0, 1].

    16-bit input follows the FULL Freiburg IR protocol (data/freiburg.py
    load_ir_image: resize to RAW_SIZE (960,320) BICUBIC -> column crop
    150:850 -> radiometric window, then the eval Resize to ``hw``); 8-bit
    input (grayscale or RGB) scales to [0, 1]."""
    from PIL import Image

    from ..data.freiburg import load_ir_image

    img = Image.open(io.BytesIO(image_bytes))
    arr = np.asarray(img)
    if arr.dtype == np.uint16:
        # route through the canonical loader so served pixels match the
        # geometry/statistics the checkpoint was trained on
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
                         f"{arr.shape[-1]} (16-bit IR is 1-channel)")
    return arr


class InferenceServer:
    """Micro-batching wrapper around a jitted argmax forward.

    Requests enqueue (array, Future); a single worker thread drains up to
    ``batch_size`` of them (waiting at most ``max_wait_ms`` for stragglers
    after the first), pads the tail to the fixed batch shape, and runs ONE
    device step — XLA compiles exactly one program shape.

    ``mesh``: data-parallel serving over a ``jax.sharding.Mesh``. The
    coalesced batch is sharded over the mesh's leading axis (the wire
    buffer's batch dim shards directly — data/wire.py), params are
    replicated, and the jitted forward runs SPMD across the chips; each
    chip segments batch_size/n_chips images. This is the inference-side
    counterpart of the training mesh (parallel/mesh.py) — the reference
    is single-GPU and has no serving surface at all."""

    def __init__(self, model, variables, *, batch_size: int = 8,
                 max_wait_ms: float = 10.0, label_hw=HW,
                 wire_bf16: bool = False, channels: int = 1,
                 predict_fn=None, preprocess_fn=None, mesh=None):
        import jax
        import jax.numpy as jnp

        from ..data.wire import PackedFeed
        from ..ops.resize import upsample_logits

        if mesh is not None and batch_size % mesh.size:
            raise ValueError(
                f"batch_size {batch_size} must divide evenly over the "
                f"{mesh.size}-device mesh (each chip gets an equal shard)")
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1e3
        self.label_hw = label_hw
        self.channels = channels
        # bf16-compute models can ship request pixels as bf16 losslessly
        # (the model casts at entry anyway) — half the host->device bytes
        self._feed = PackedFeed(mesh,
                                float_wire="bfloat16" if wire_bf16 else None)

        @jax.jit
        def predict(variables, images):
            out = model.apply(variables, images, train=False)
            logits = upsample_logits(out["out"], *label_hw)
            # uint8 ids: 4x fewer bytes on the device->host fetch
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        # predict_fn swaps the forward (e.g. a GAN generator for the
        # translation kind) while keeping the micro-batcher identical;
        # preprocess_fn swaps the request decoding to match
        self._predict = predict_fn or predict
        self._preprocess = preprocess_fn or (
            lambda data: preprocess(data, self.label_hw, self.channels))
        # params live on device for the server's lifetime — passing host
        # numpy into the jit would re-upload every weight on every batch
        if mesh is not None:
            from ..parallel.mesh import replicate
            self._variables = replicate(mesh, variables)
        else:
            self._variables = jax.device_put(variables)
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        # serializes submit()'s stop-check-then-put against stop()'s final
        # drain: without it a submit could check, lose the CPU, and enqueue
        # after both shutdown drains ran — its waiter would never be answered
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self.batches_run = 0
        self.requests_served = 0

    def warmup(self):
        zero = np.zeros((self.batch_size, *self.label_hw, self.channels),
                        np.float32)
        # go through the wire feed so warmup compiles the EXACT production
        # program: same wire dtype AND same input sharding (on a mesh, a raw
        # host array would compile a second, unsharded program)
        zero = self._feed.put({"images": zero})["images"]
        np.asarray(self._predict(self._variables, zero))

    def start(self):
        self._worker.start()

    def stop(self):
        self._stop.set()
        self._queue.put(None)
        if self._worker.ident is not None:  # started
            self._worker.join(timeout=5)
        # final drain under the submit lock: every submit either enqueued
        # before this drain (and gets failed here) or observes _stop set
        # inside the lock (and fails itself) — no waiter can be orphaned
        with self._submit_lock:
            while True:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    return
                if item is not None:
                    item[1].put(InferenceError("server stopped"))

    def submit(self, arr: np.ndarray) -> "queue.Queue":
        """Enqueue one (H, W, 1) image; returns a single-item result queue."""
        out: queue.Queue = queue.Queue(maxsize=1)
        with self._submit_lock:
            if self._stop.is_set():
                out.put(InferenceError("server stopped"))
                return out
            self._queue.put((arr, out))
        return out

    def segment(self, image_bytes: bytes) -> np.ndarray:
        """Blocking helper: bytes in, the forward's per-image output out
        ((H, W) uint8 class ids for the default segmentation kind)."""
        result = self.submit(self._preprocess(image_bytes)).get()
        if isinstance(result, Exception):
            raise InferenceError(str(result))
        return result

    def _run(self):
        try:
            self._run_loop()
        finally:
            # deliver a failure to any request still queued (enqueued after
            # the stop sentinel or mid-shutdown) so no segment() call blocks
            # forever on its result queue
            while True:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    item[1].put(InferenceError("server stopped"))

    def _run_loop(self):
        import time
        while not self._stop.is_set():
            item = self._queue.get()
            if item is None:
                return
            batch = [item]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._stop.set()
                    break
                batch.append(nxt)
            try:
                images = pad_rows(np.stack([b[0] for b in batch]),
                                  self.batch_size)
                images = self._feed.put({"images": images})["images"]
                preds = np.asarray(self._predict(self._variables, images))
                self.batches_run += 1
                for (_, out), pred in zip(batch, preds):
                    out.put(pred)
                    self.requests_served += 1
            except Exception as e:  # deliver the failure to every waiter
                for _, out in batch:
                    out.put(e)
