"""Inference server (cli/serve.py): micro-batching, HTTP surface, formats."""

import io
import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

import jax

from thermal_semantic_segmentation_tpu.cli.serve import (
    InferenceServer, make_handler, preprocess)
from thermal_semantic_segmentation_tpu.models.deeplab import create_deeplab

TINY = dict(num_classes=13, num_channels=1, layers=(1, 1, 1, 1),
            image_size=(64, 128))
HW = (64, 128)


def _png_bytes(arr, mode=None):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    model, variables = create_deeplab(jax.random.key(0), **TINY)
    srv = InferenceServer(model, variables, batch_size=4, max_wait_ms=30,
                          label_hw=HW)
    srv.warmup()
    srv.start()
    yield srv
    srv.stop()


def test_preprocess_u16_and_u8():
    u16 = (np.random.default_rng(0).integers(21000, 26000, (40, 120))
           .astype(np.uint16))
    out = preprocess(_png_bytes(u16), HW)
    assert out.shape == (*HW, 1) and out.dtype == np.float32
    # BICUBIC ringing may overshoot [0,1] slightly — exactly as the real
    # eval path (load_ir_image -> Resize) does; assert the window held
    assert -0.3 <= out.min() and out.max() <= 1.3
    u8 = np.random.default_rng(1).integers(0, 255, (40, 120, 3)).astype(np.uint8)
    out = preprocess(_png_bytes(u8), HW)
    assert out.shape == (*HW, 1) and out.max() <= 1.0


def test_preprocess_matches_eval_protocol():
    """16-bit requests must go through the SAME geometry as training/eval:
    resize (960,320) -> column crop 150:850 -> window -> resize to hw."""
    from PIL import Image
    from thermal_semantic_segmentation_tpu.data.freiburg import load_ir_image

    u16 = (np.random.default_rng(4).integers(21000, 26000, (320, 960))
           .astype(np.uint16))
    payload = _png_bytes(u16)
    got = preprocess(payload, HW)
    want_img = load_ir_image(io.BytesIO(payload))
    want = np.asarray(want_img.resize((HW[1], HW[0]), Image.BICUBIC),
                      dtype=np.float32)[..., None]
    np.testing.assert_array_equal(got, want)


def test_preprocess_rejects_channel_mismatch():
    u16 = (np.random.default_rng(5).integers(21000, 26000, (40, 120))
           .astype(np.uint16))
    with pytest.raises(ValueError, match="channel"):
        preprocess(_png_bytes(u16), HW, channels=3)


def test_micro_batching_coalesces(server):
    """8 concurrent requests through a batch-4 server: every request gets a
    correct-shape answer and the worker ran fewer batches than requests."""
    u16 = (np.random.default_rng(2).integers(21000, 26000, (40, 120))
           .astype(np.uint16))
    payload = _png_bytes(u16)
    before = server.batches_run
    with ThreadPoolExecutor(8) as pool:
        preds = list(pool.map(lambda _: server.segment(payload), range(8)))
    for p in preds:
        assert p.shape == HW and p.dtype == np.uint8
        assert (0 <= p).all() and (p < 13).all()
    ran = server.batches_run - before
    assert 2 <= ran < 8  # coalesced (identical inputs -> identical preds)
    np.testing.assert_array_equal(preds[0], preds[1])


def test_concurrent_http_load_coalesces(server):
    """16 parallel HTTP clients, multiple rounds: every request succeeds and
    the worker coalesces (batches_run grows by far less than requests) — the
    micro-batching design's whole point, proven under real socket load."""
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "load"}))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    u16 = (np.random.default_rng(6).integers(21000, 26000, (40, 120))
           .astype(np.uint16))
    payload = _png_bytes(u16)
    url = f"http://127.0.0.1:{port}/segment?format=ids"

    def post(_):
        req = urllib.request.Request(url, data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.read()

    n_clients, rounds = 16, 3
    before_b, before_r = server.batches_run, server.requests_served
    try:
        with ThreadPoolExecutor(n_clients) as pool:
            results = list(pool.map(post, range(n_clients * rounds)))
    finally:
        httpd.shutdown()
    assert all(code == 200 for code, _ in results)
    served = server.requests_served - before_r
    ran = server.batches_run - before_b
    assert served == n_clients * rounds
    # with a batch-4 server and 16-way concurrency the worker must have
    # coalesced well below one-batch-per-request
    assert ran <= served * 3 // 4, (ran, served)
    ids = np.asarray(Image.open(io.BytesIO(results[0][1])))
    assert ids.shape == HW and ids.max() < 13


def test_stop_fails_pending_requests_instead_of_hanging():
    """Shutdown must deliver InferenceError to queued waiters (and to
    submits that race the stop), never leave segment() blocked forever."""
    import queue as queue_mod

    from thermal_semantic_segmentation_tpu.cli.serve import InferenceError

    model, variables = create_deeplab(jax.random.key(1), **TINY)
    srv = InferenceServer(model, variables, batch_size=4, max_wait_ms=5,
                          label_hw=HW)
    srv.warmup()
    # never started: the queue only drains at stop() — requests enqueued now
    # would hang forever without the shutdown drain
    arr = np.zeros((*HW, 1), np.float32)
    waiters = [srv.submit(arr) for _ in range(3)]
    srv._stop.set()          # simulate shutdown racing the submissions
    srv.stop()
    for w in waiters:
        result = w.get(timeout=5)
        assert isinstance(result, InferenceError)
    # submits after stop fail immediately too
    late = srv.submit(arr).get(timeout=5)
    assert isinstance(late, InferenceError)
    with pytest.raises(queue_mod.Empty):
        srv._queue.get_nowait()


def test_stream_endpoint_orders_coalesces_and_isolates_bad_frames(server):
    """/segment_stream: 9 images + 1 corrupt frame in ONE request. Results
    come back in request order, the bad frame reports in-band (status 1)
    without failing the others, and the frames coalesced into device
    batches (that's the endpoint's point: one client fills batches)."""
    from thermal_semantic_segmentation_tpu.cli.serve import stream_segment

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "st"}))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    rng = np.random.default_rng(7)
    frames = [_png_bytes(rng.integers(21000, 26000, (40, 120))
                         .astype(np.uint16)) for _ in range(9)]
    frames.insert(4, b"this is not an image")
    before_b, before_r = server.batches_run, server.requests_served
    try:
        url = f"http://127.0.0.1:{port}/segment_stream?format=ids"
        results = list(stream_segment(url, frames))
    finally:
        httpd.shutdown()
    assert [s for s, _ in results] == [0] * 4 + [1] + [0] * 5
    assert b"bad frame" in results[4][1]
    for status, payload in results[:4] + results[5:]:
        ids = np.asarray(Image.open(io.BytesIO(payload)))
        assert ids.shape == HW and ids.max() < 13
    served = server.requests_served - before_r
    ran = server.batches_run - before_b
    assert served == 9
    assert ran <= 4, (ran, served)  # 9 submissions into batch-4 coalesced


def test_stream_long_request_bounds_pending(server):
    """40 frames through the batch-4 server exceed MAX_PENDING (16): the
    handler must finalize old frames early (bounding decoded-frame memory)
    while still returning every result in request order."""
    from thermal_semantic_segmentation_tpu.cli.serve import stream_segment

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "st"}))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    rng = np.random.default_rng(8)
    frames = [_png_bytes(rng.integers(21000, 26000, (40, 120))
                         .astype(np.uint16)) for _ in range(40)]
    try:
        url = f"http://127.0.0.1:{port}/segment_stream?format=ids"
        results = list(stream_segment(url, frames))
    finally:
        httpd.shutdown()
    assert len(results) == 40
    assert all(s == 0 for s, _ in results)
    for _, payload in results[:2] + results[-2:]:
        ids = np.asarray(Image.open(io.BytesIO(payload)))
        assert ids.shape == HW and ids.max() < 13


def test_stream_malformed_framing_is_400(server):
    import struct
    import urllib.error

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "st"}))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        # frame header claims more bytes than the body carries
        body = struct.pack(">Q", 10_000) + b"short"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segment_stream", data=body,
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=30)
        assert err.value.code == 400
    finally:
        httpd.shutdown()


def test_stream_without_content_length_is_411(server):
    """A chunked-encoded (no Content-Length) body would silently read as an
    empty stream: 200 with zero results, unread body corrupting the next
    keep-alive request. The endpoint must refuse it up front."""
    import http.client

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "st"}))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/segment_stream", body=iter([b"\0" * 16]),
                     headers={"Transfer-Encoding": "chunked"})
        resp = conn.getresponse()
        assert resp.status == 411, resp.status
        conn.close()
    finally:
        httpd.shutdown()


def test_http_surface(server):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "test"}))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["checkpoint"] == "test"

        u16 = (np.random.default_rng(3).integers(21000, 26000, (40, 120))
               .astype(np.uint16))
        payload = _png_bytes(u16)

        def post(path):
            req = urllib.request.Request(f"{base}{path}", data=payload,
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                return r.headers.get("Content-Type"), r.read()

        ctype, body = post("/segment")
        assert ctype == "image/png"
        assert Image.open(io.BytesIO(body)).size == (HW[1], HW[0])

        ctype, body = post("/segment?format=ids")
        ids = np.asarray(Image.open(io.BytesIO(body)))
        assert ids.shape == HW and ids.max() < 13

        ctype, body = post("/segment?format=json")
        stats = json.loads(body)
        assert stats["shape"] == list(HW)
        assert sum(stats["class_counts"].values()) == HW[0] * HW[1]

        # malformed input -> 400, not a hung request
        req = urllib.request.Request(f"{base}/segment", data=b"not a png",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400
    finally:
        httpd.shutdown()


def test_keepalive_connection_survives_early_exit_responses(server):
    """HTTP/1.1 keep-alive: responses sent before the request body is read
    (404 on a bad path) must drain or close — otherwise the unread body is
    parsed as the NEXT request line and a well-behaved client sees a corrupt
    response on its next use of the connection."""
    import http.client

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "ka"}))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    u16 = (np.random.default_rng(9).integers(21000, 26000, (40, 120))
           .astype(np.uint16))
    payload = _png_bytes(u16)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        # 1. POST a real body to a bad path -> 404, body must be drained
        conn.request("POST", "/nope", body=payload)
        assert conn.getresponse().read() == b"not found"
        # 2. the SAME connection must still speak clean HTTP
        conn.request("POST", "/segment?format=ids", body=payload)
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200, (resp.status, body[:100])
        ids = np.asarray(Image.open(io.BytesIO(body)))
        assert ids.shape == HW
        # 3. a bad-image 400 (body fully read) also keeps the conn usable
        conn.request("POST", "/segment", body=b"not a png")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.request("POST", "/segment?format=ids", body=payload)
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()
        conn.close()
    finally:
        httpd.shutdown()


def test_segment_without_content_length_is_411(server):
    """Chunked POST /segment: the unread chunked body would otherwise be
    parsed as the next keep-alive request line. The endpoint must refuse
    up front and close; a fresh connection then works normally."""
    import http.client

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "te"}))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/segment", body=iter([b"\0" * 16]),
                     headers={"Transfer-Encoding": "chunked"})
        resp = conn.getresponse()
        assert resp.status == 411, resp.status
        resp.read()
        conn.close()
        # chunked POST to an unknown path must not poison keep-alive either:
        # the server closes the connection instead of misparsing the body
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/nope", body=iter([b"\0" * 16]),
                     headers={"Transfer-Encoding": "chunked"})
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        assert resp.isclosed()
        conn.close()
        # server still healthy on a fresh connection
        u16 = (np.random.default_rng(2).integers(21000, 26000, (40, 120))
               .astype(np.uint16))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segment?format=ids",
            data=_png_bytes(u16), method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
    finally:
        httpd.shutdown()


@pytest.fixture(scope="module")
def translation_server():
    from thermal_semantic_segmentation_tpu.cli.serve import (
        make_translation_fns)
    from thermal_semantic_segmentation_tpu.models.factory import (
        init_gan_net, unet_256)

    model = unet_256(ngf=4, input_nc=3, output_nc=1)
    variables = init_gan_net(model, jax.random.key(0), (1, 256, 512, 3))
    pre, predict, encode = make_translation_fns(
        model, channels=3, normalize=[0.5, 0.5, 0.5], denormalize=[0.5])
    srv = InferenceServer(model, variables, batch_size=4, max_wait_ms=30,
                          label_hw=(256, 512), channels=3,
                          predict_fn=predict, preprocess_fn=pre)
    srv.warmup()
    srv.start()
    yield srv, model, variables, pre, encode
    srv.stop()


def test_translation_kind_http_roundtrip(translation_server):
    """--kind translator: POST /translate returns the PNG the offline
    translator would produce for the same input (same Normalize(m,m) in,
    clip((y*d+d)*255) out; translator.py:36,104)."""
    srv, model, variables, pre, encode = translation_server
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(srv, {"checkpoint": "g", "kind": "translator"},
                     encode=encode,
                     endpoints=("/translate", "/translate_stream")))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    rgb = (np.random.default_rng(7).integers(0, 256, (40, 120, 3))
           .astype(np.uint8))
    payload = _png_bytes(rgb)
    try:
        req = urllib.request.Request(f"http://127.0.0.1:{port}/translate",
                                     data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers.get("Content-Type") == "image/png"
            img = Image.open(io.BytesIO(r.read()))
        assert img.mode == "L" and img.size == (512, 256)

        # parity with the direct forward (eval-mode BN: padding-safe)
        x = pre(payload)[None]
        ref = np.asarray(model.apply(variables, x, train=False,
                                     mutable=False))
        ref = np.clip((ref * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(img), ref[0, ..., 0])

        # the seg endpoints do not exist on this kind
        req = urllib.request.Request(f"http://127.0.0.1:{port}/segment",
                                     data=payload, method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=60)
        assert err.value.code == 404
    finally:
        httpd.shutdown()


def test_translation_stream_endpoint(translation_server):
    from thermal_semantic_segmentation_tpu.cli.serve import stream_segment

    srv, model, variables, pre, encode = translation_server
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(srv, {"kind": "translator"}, encode=encode,
                     endpoints=("/translate", "/translate_stream")))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    rng = np.random.default_rng(11)
    frames = [_png_bytes(rng.integers(0, 256, (40, 120, 3)).astype(np.uint8))
              for _ in range(3)]
    try:
        results = list(stream_segment(
            f"http://127.0.0.1:{port}/translate_stream", frames,
            timeout=300))
        assert [s for s, _ in results] == [0, 0, 0]
        for frame, (_, payload) in zip(frames, results):
            img = Image.open(io.BytesIO(payload))
            assert img.mode == "L" and img.size == (512, 256)
            # pixel parity with the single-image endpoint semantics: the
            # stream MUST use the translator preprocess ((x-m)/m), not the
            # seg [0,1] scaling (a real regression this test now pins)
            x = pre(frame)[None]
            ref = np.asarray(model.apply(variables, x, train=False,
                                         mutable=False))
            ref = np.clip((ref * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
            np.testing.assert_array_equal(np.asarray(img), ref[0, ..., 0])
    finally:
        httpd.shutdown()


def test_unsupported_format_is_400(server):
    """format=bogus must be refused up front — not silently answered with a
    differently-typed payload."""
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, {"checkpoint": "f"}))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    u16 = (np.random.default_rng(4).integers(21000, 26000, (40, 120))
           .astype(np.uint16))
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segment?format=bogus",
            data=_png_bytes(u16), method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=60)
        assert err.value.code == 400
        assert b"unsupported format" in err.value.read()
    finally:
        httpd.shutdown()


def test_translation_16bit_ir_uses_radiometric_window(translation_server):
    """A 16-bit thermal frame to a 1-channel translator preprocess must go
    through the Freiburg radiometric window, not a saturating convert()."""
    from thermal_semantic_segmentation_tpu.cli.serve import (
        make_translation_fns)
    from thermal_semantic_segmentation_tpu.models.factory import (
        init_gan_net, unet_256)

    model1 = unet_256(ngf=4, input_nc=1, output_nc=3)
    pre1, _, _ = make_translation_fns(model1, channels=1,
                                      normalize=[0.5], denormalize=[0.5])
    u16 = (np.random.default_rng(5).integers(21000, 26000, (40, 120))
           .astype(np.uint16))
    arr = pre1(_png_bytes(u16))
    assert arr.shape == (256, 512, 1)
    # windowed values land in ~(-1, 1) (BICUBIC overshoot allowed) with real
    # spread; a saturating convert('L') would collapse everything to the
    # constant (255-ish - m)/m near +1 with ~zero variance
    assert -1.1 <= arr.min() and arr.max() <= 1.1
    assert arr.std() > 0.05


def test_mesh_data_parallel_serving():
    """Data-parallel serving over the 8-device CPU mesh: params replicated,
    the coalesced batch sharded over 'data', predictions match a plain
    single-device forward on the same pixels (cli/serve.py mesh= path)."""
    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh()
    model, variables = create_deeplab(jax.random.key(3), **TINY)
    srv = InferenceServer(model, variables, batch_size=mesh.size,
                          max_wait_ms=30, label_hw=HW, mesh=mesh)
    srv.warmup()
    srv.start()
    try:
        # params replicated onto every mesh device
        leaf = jax.tree.leaves(srv._variables)[0]
        assert len(leaf.sharding.device_set) == mesh.size
        assert leaf.sharding.is_fully_replicated
        # the wire feed's unpacked batch is sharded over the data axis
        fed = srv._feed.put(
            {"images": np.zeros((mesh.size, *HW, 1), np.float32)})["images"]
        assert len(fed.sharding.device_set) == mesh.size
        assert not fed.sharding.is_fully_replicated

        rng = np.random.default_rng(9)
        imgs = [rng.integers(21000, 26000, (40, 120)).astype(np.uint16)
                for _ in range(mesh.size)]
        payloads = [_png_bytes(im) for im in imgs]
        before = srv.batches_run
        # enqueue everything from ONE thread before the worker's wait
        # window closes: deterministic coalescing even on a loaded host
        waiters = [srv.submit(preprocess(p, HW)) for p in payloads]
        preds = [w.get(timeout=300) for w in waiters]
        assert not any(isinstance(p, Exception) for p in preds)
        assert srv.batches_run - before < len(payloads)  # coalesced SPMD runs
        for p in preds:
            assert p.shape == HW and p.dtype == np.uint8 and p.max() < 13

        # oracle: the same preprocessed pixels through an unsharded jit
        import jax.numpy as jnp

        from thermal_semantic_segmentation_tpu.ops.resize import (
            upsample_logits)

        @jax.jit
        def oracle(variables, images):
            out = model.apply(variables, images, train=False)
            return jnp.argmax(upsample_logits(out["out"], *HW),
                              axis=-1).astype(jnp.uint8)

        batch = np.stack([preprocess(p, HW) for p in payloads])
        ref = np.asarray(oracle(variables, batch))
        # sharded vs unsharded reductions may flip argmax on exact logit
        # ties; require pixel-level agreement up to a tiny tie budget
        mismatch = np.mean([np.mean(p != r) for p, r in zip(preds, ref)])
        assert mismatch < 0.005, mismatch
    finally:
        srv.stop()


def test_mesh_batch_size_must_divide():
    """A batch that can't split evenly over the mesh is a config error —
    caught at construction, not as a runtime XLA sharding failure."""
    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    model, variables = create_deeplab(jax.random.key(0), **TINY)
    with pytest.raises(ValueError, match="mesh"):
        InferenceServer(model, variables, batch_size=len(jax.devices()) + 1,
                        label_hw=HW, mesh=make_mesh())
