"""Batch inference server for segmentation checkpoints.

A deployment surface the reference lacks: load a checkpoint once, keep the
jitted forward warm, and serve segmentation over HTTP with transparent
micro-batching — concurrent requests are coalesced into fixed-size batches
(padded, so the XLA program never recompiles) up to a latency budget.

    python -m thermal_semantic_segmentation_tpu.cli.serve \
        -checkpoint_name s.pth --port 8756 --bf16 true -batch_size 8

Endpoints:
  GET  /healthz            -> {"status": "ok", ...}
  POST /segment            -> palette PNG of the predicted classes
  POST /segment?format=ids -> 8-bit PNG of raw class ids
  POST /segment?format=json-> {"class_counts": {...}, "shape": [H, W]}
  POST /segment_stream     -> many images in ONE request, results streamed
                              back as they complete (chunked encoding)

With ``--kind translator`` the server instead loads a GAN generator from a
GAN checkpoint and serves ``POST /translate`` / ``POST /translate_stream``
(PNG of the translated image) — the online counterpart of the offline
``cli/translator.py``, with the same normalization semantics and the same
micro-batcher.

Input: PNG/JPEG bytes. 16-bit images get the Freiburg IR radiometric window
(data/freiburg.py); 8-bit images are scaled to [0,1]. Everything is resized
to the model's 256x512 protocol resolution (eval transform semantics).

Streaming wire format (``/segment_stream``, same ``format=`` query as
``/segment``): the request body is a sequence of frames, each
``8-byte big-endian length || image bytes``. Every frame is submitted to the
micro-batcher immediately on arrival, so one streaming client saturates the
device batches without needing concurrent connections. The response is
HTTP/1.1 chunked; inside the stream each result is one frame of
``1 status byte || 8-byte big-endian length || payload`` in request order,
where status 0 = ok (payload is the PNG/JSON result), 1 = bad frame
(payload is the error message; other frames are unaffected), 2 = inference
error. ``stream_segment()`` below is a reference client.

``--data_parallel true`` shards every coalesced batch over all visible
chips (params replicated, batch split over a ``jax.sharding`` mesh): the
micro-batcher aggregates concurrent requests into one SPMD forward, so N
chips serve N× the single-chip rate at the same per-request latency.

Stdlib only (ThreadingHTTPServer) — no web framework dependency.
"""

from __future__ import annotations

import io
import json
import queue
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

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


def make_handler(server: InferenceServer, model_info: dict, *,
                 encode=None, endpoints=("/segment", "/segment_stream"),
                 formats=("palette", "ids", "json")):
    from ..data.palette import freiburg_palette

    palette = freiburg_palette()
    encode_fn = encode or (lambda pred, fmt: encode_result(pred, fmt, palette))
    one_path, stream_path = endpoints
    allowed_formats = frozenset(formats)

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 enables chunked responses for /segment_stream (and
        # keep-alive for the fixed-length endpoints, which all set
        # Content-Length)
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _drain_body(self):
            # under HTTP/1.1 keep-alive, a response sent with the request
            # body still unread leaves those bytes to be parsed as the NEXT
            # request line; drain (or, if the length is unknowable, close)
            # before replying on any early-exit path
            if ("Content-Length" not in self.headers
                    and self.headers.get("Transfer-Encoding")):
                # chunked body: length unknowable without parsing the
                # framing — close instead of leaving it to corrupt the
                # next keep-alive request
                self.close_connection = True
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self.close_connection = True
                return
            while n > 0:
                chunk = self.rfile.read(min(n, 1 << 16))
                if not chunk:
                    self.close_connection = True
                    return
                n -= len(chunk)

        def do_GET(self):
            if self.path.split("?")[0] == "/healthz":
                info = dict(model_info, status="ok",
                            batches_run=server.batches_run,
                            requests_served=server.requests_served)
                self._send(200, json.dumps(info).encode(), "application/json")
            else:
                self._drain_body()
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            path, _, query = self.path.partition("?")
            fmt = "palette"
            for part in query.split("&"):
                if part.startswith("format="):
                    fmt = part.split("=", 1)[1]
            if path in (one_path, stream_path) and fmt not in allowed_formats:
                # an unsupported format must not come back as a silently
                # different payload (e.g. PNG bytes to a json-expecting
                # client) — refuse before any inference runs
                self._drain_body()
                self._send(400, f"unsupported format {fmt!r}; one of "
                                f"{sorted(allowed_formats)}".encode(),
                           "text/plain")
            elif path == one_path:
                self._segment_one(fmt)
            elif path == stream_path:
                self._segment_stream(fmt)
            else:
                self._drain_body()
                self._send(404, b"not found", "text/plain")

        def _segment_one(self, fmt):
            if "Content-Length" not in self.headers:
                # same hazard as /segment_stream: a chunked body would be
                # read as empty and its unread bytes would be parsed as the
                # next keep-alive request line. Require a length up front.
                self.close_connection = True
                self._send(411, f"length required: {one_path} needs "
                                f"Content-Length (chunked upload unsupported)"
                           .encode(), "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(length)
            except Exception as e:
                self.close_connection = True  # body state unknown
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            try:
                pred = server.segment(data)
            except InferenceError as e:
                self._send(500, f"inference failed: {e}".encode(), "text/plain")
                return
            except Exception as e:
                # body fully read above: the connection stays reusable
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            body, ctype = encode_fn(pred, fmt)
            self._send(200, body, ctype)

        def _segment_stream(self, fmt):
            # Read `8-byte len || image` frames, submitting each to the
            # micro-batcher AS IT ARRIVES (frames from one request coalesce
            # into device batches with each other and with other clients),
            # then stream per-frame results back in order via chunked
            # encoding. Per-frame failures travel in-band (status byte) so
            # one bad image doesn't fail the request.
            #
            # Memory bound: at most MAX_PENDING decoded frames are in
            # flight; beyond that the oldest frame is finalized (inference
            # awaited, result ENCODED, raw arrays freed) before reading
            # more, so an arbitrarily long stream holds encoded results
            # (KBs each) instead of decoded float frames (~512 KB each).
            # Results are NOT written before the body is fully read — a
            # single-threaded client that uploads everything before reading
            # (e.g. urllib) would deadlock against a full-duplex server.
            MAX_PENDING = 4 * server.batch_size

            def finalize(item):
                if isinstance(item, queue.Queue):
                    result = item.get()
                    if isinstance(result, Exception):
                        return 2, str(result).encode()
                    return 0, encode_fn(result, fmt)[0]
                return item

            if "Content-Length" not in self.headers:
                # a chunked-encoded body would otherwise be read as an empty
                # stream: 200 with zero results and the unread body corrupting
                # the next keep-alive request. Require a length up front.
                self.close_connection = True
                self._send(411, f"length required: {stream_path} needs "
                                f"Content-Length (chunked upload unsupported)"
                           .encode(), "text/plain")
                return
            remaining = int(self.headers.get("Content-Length", 0))
            done = []     # finalized (status, payload), in request order
            pending = []  # (result queue | (status, payload)) per frame
            try:
                while remaining:
                    if remaining < 8:
                        raise ValueError("truncated frame header")
                    (length,) = struct.unpack(">Q",
                                              _read_exact(self.rfile, 8))
                    remaining -= 8
                    if length > remaining:
                        raise ValueError("frame length exceeds body")
                    data = _read_exact(self.rfile, length)
                    remaining -= length
                    try:
                        # the server's OWN preprocess: the translator kind
                        # normalizes to (x-m)/m, not the seg [0,1] scaling
                        arr = server._preprocess(data)
                    except Exception as e:  # bad frame: report in-band
                        pending.append((1, f"bad frame: {e}".encode()))
                        continue
                    pending.append(server.submit(arr))
                    while len(pending) > MAX_PENDING:
                        done.append(finalize(pending.pop(0)))
            except Exception as e:
                # malformed framing: nothing streamed yet -> plain 400.
                # The body was not fully read, so this connection cannot be
                # reused for a next keep-alive request.
                self.close_connection = True
                for item in pending:
                    if isinstance(item, queue.Queue):
                        item.get()  # drain; device work is already queued
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for status, payload in done:
                self._write_stream_frame(status, payload)
            for item in pending:
                status, payload = finalize(item)
                self._write_stream_frame(status, payload)
            self.wfile.write(b"0\r\n\r\n")

        def _write_stream_frame(self, status, payload):
            frame = bytes([status]) + struct.pack(">Q",
                                                  len(payload)) + payload
            self.wfile.write(f"{len(frame):X}\r\n".encode() + frame
                             + b"\r\n")

    return Handler


def serve_parse():
    from .options import HostConfigParser, _add_roots
    parser = HostConfigParser(description="segmentation/translation "
                                          "inference server")
    parser.add_argument("--kind", type=str, default="seg",
                        choices=["seg", "translator"],
                        help="'seg': POST /segment[_stream] class maps; "
                             "'translator': POST /translate[_stream] GAN-"
                             "translated images (online cli/translator.py)")
    parser.add_argument("--artifact", type=str, default="",
                        help="serve a StableHLO artifact "
                             "(cli/export_stablehlo.py) instead of a "
                             "checkpoint: weights live in the blob, its "
                             "sidecar selects the endpoint surface")
    parser.add_argument("-checkpoint_name", type=str,
                        default="256_freiburg_segmentation.pth")
    parser.add_argument("-net_mode", type=str, default="one_channel")
    parser.add_argument("-num_classes", type=int, default=13)
    parser.add_argument("-generator_type", type=str, default="s2t",
                        choices=["s2t", "t2s"])
    parser.add_argument("-input_nc", type=int, default=3)
    parser.add_argument("-output_nc", type=int, default=1)
    parser.add_argument("-normalize", type=float, nargs="+",
                        default=[0.5, 0.5, 0.5])
    parser.add_argument("-denormalize", type=float, nargs="+", default=[0.5])
    parser.add_argument("-batch_size", type=int, default=8)
    parser.add_argument("--max_wait_ms", type=float, default=10.0,
                        help="micro-batching latency budget after the first "
                             "request of a batch arrives.")
    # --data_parallel comes from the shared _add_roots block: shards each
    # coalesced batch over all chips (symbolic-batch artifacts are
    # shard_map'd; fixed-batch artifacts need a dynamic re-export).
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8756)
    _add_roots(parser)
    return parser


def _server_from_artifact(args, mesh=None):
    """Serve a StableHLO artifact (cli/export_stablehlo.py) directly: no
    model code or checkpoint needed — the weights live inside the blob.
    The sidecar's ``output_kind`` selects the endpoint surface.

    ``mesh``: data-parallel artifact serving. The exported program is a
    single-device computation, so it is shard_map'd over the mesh's data
    axis — every chip runs the blob on its batch shard (bit-identical to
    the unsharded call; tested). Needs a symbolic-batch artifact (the
    per-chip batch is batch_size/n_chips)."""
    import jax
    import jax.numpy as jnp

    from ..core.stablehlo import exported_sidecar, load_exported

    sidecar = exported_sidecar(args.artifact)
    exported = load_exported(args.artifact)
    spec = sidecar["input"][0]
    batch_dim = spec["shape"][0]
    if batch_dim != "b" and int(batch_dim) != args.batch_size:
        raise SystemExit(
            f"artifact has a fixed batch of {batch_dim}; pass "
            f"-batch_size {batch_dim} or re-export with --batch dynamic")
    hw = (int(spec["shape"][1]), int(spec["shape"][2]))
    channels = int(spec["shape"][3])
    # the blob enforces its recorded input avals: the wire dtype must follow
    # the artifact, NOT --bf16 (a bf16 feed into an f32-aval program fails;
    # warmup runs through the same feed, so a mismatch dies at startup)
    wire_bf16 = spec.get("dtype") == "bfloat16"
    call = exported.call
    if mesh is not None and mesh.size > 1:
        if batch_dim != "b":
            raise SystemExit(
                "--data_parallel artifact serving needs a symbolic batch "
                "(each chip runs batch_size/n_chips) — re-export with "
                "--batch dynamic")
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS
        call = jax.shard_map(call, mesh=mesh,
                             in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS))
    kind = sidecar.get("output_kind", "ids")
    if kind == "ids":
        predict = jax.jit(lambda variables, images: call(images))
        server = InferenceServer(
            None, {}, batch_size=args.batch_size,
            max_wait_ms=args.max_wait_ms, label_hw=hw,
            wire_bf16=wire_bf16, channels=channels,
            predict_fn=predict, mesh=mesh)
        return server, {}
    if kind == "translation":
        denorm = np.asarray(args.denormalize, np.float32)

        @jax.jit
        def predict(variables, images):
            out = call(images)
            return jnp.clip((out * denorm + denorm) * 255.0, 0, 255
                            ).astype(jnp.uint8)

        # only pre/encode are used from here (predict comes from the blob)
        pre, _, encode = make_translation_fns(
            None, channels=channels, normalize=args.normalize,
            denormalize=args.denormalize, hw=hw)
        server = InferenceServer(
            None, {}, batch_size=args.batch_size,
            max_wait_ms=args.max_wait_ms, label_hw=hw,
            wire_bf16=wire_bf16, channels=channels,
            predict_fn=predict, preprocess_fn=pre, mesh=mesh)
        return server, dict(encode=encode,
                            endpoints=("/translate", "/translate_stream"),
                            formats=("palette", "png"))
    raise SystemExit(f"artifact output_kind {kind!r} is not servable "
                     f"(logits artifacts are for downstream soft use)")


def main(argv=None):
    import os

    args = serve_parse().parse_args(argv)
    handler_kw = {}
    mesh = None
    if getattr(args, "data_parallel", False):
        from ..parallel.mesh import local_data_mesh
        mesh = local_data_mesh(batch_size=args.batch_size)
        print(f"data-parallel serving over {mesh.size} devices", flush=True)
    if getattr(args, "artifact", ""):
        server, handler_kw = _server_from_artifact(args, mesh=mesh)
    elif args.kind == "seg":
        from ._common import (apply_model_meta, build_deeplab,
                              load_seg_checkpoint)

        variables, meta = load_seg_checkpoint(
            os.path.join(args.model_root_path, args.checkpoint_name))
        apply_model_meta(args, meta)
        model, _ = build_deeplab(args, abstract=True)  # --bf16: compute dtype
        server = InferenceServer(
            model, variables, batch_size=args.batch_size,
            max_wait_ms=args.max_wait_ms,
            wire_bf16=bool(getattr(args, "bf16", False)),
            channels=1 if args.net_mode == "one_channel" else 3,
            mesh=mesh)
    else:
        from ._common import build_generator_from_gan_checkpoint

        model, variables, _ = build_generator_from_gan_checkpoint(
            os.path.join(args.gan_model_root_path, args.checkpoint_name),
            args.generator_type, input_nc=args.input_nc,
            output_nc=args.output_nc, bf16=bool(getattr(args, "bf16", False)))
        pre, predict, encode = make_translation_fns(
            model, channels=args.input_nc, normalize=args.normalize,
            denormalize=args.denormalize)
        server = InferenceServer(
            model, variables, batch_size=args.batch_size,
            max_wait_ms=args.max_wait_ms,
            wire_bf16=bool(getattr(args, "bf16", False)),
            channels=args.input_nc, predict_fn=predict, preprocess_fn=pre,
            mesh=mesh)
        handler_kw = dict(encode=encode,
                          endpoints=("/translate", "/translate_stream"),
                          formats=("palette", "png"))  # both mean PNG here
    print("compiling...", flush=True)
    server.warmup()
    server.start()
    artifact = getattr(args, "artifact", "")
    info = {
        # when serving a blob the (defaulted) checkpoint flag is meaningless
        "checkpoint": "" if artifact else args.checkpoint_name,
        "batch_size": args.batch_size, "kind": args.kind,
        "artifact": artifact, "bf16": bool(getattr(args, "bf16", False)),
        "devices": mesh.size if mesh is not None else 1}
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(server, info, **handler_kw))
    print(f"serving on http://{args.host}:{args.port} "
          f"(batch {args.batch_size}, wait {args.max_wait_ms} ms)", flush=True)
    # production schedulers stop services with SIGTERM: turn it into a
    # SystemExit out of serve_forever so the finally runs server.stop(),
    # which fails queued requests explicitly instead of hanging clients
    import signal
    import sys as _sys
    signal.signal(signal.SIGTERM, lambda s, f: _sys.exit(0))
    try:
        httpd.serve_forever()
    finally:
        server.stop()


if __name__ == "__main__":
    main()
