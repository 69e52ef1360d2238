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

from http.server import ThreadingHTTPServer

import numpy as np

# The serving engine lives in the ``serving`` package (batcher / codec /
# endpoints); this module is the CLI front-end. The names below are
# re-exported because tests, bench_all.py and downstream users import them
# from here.
from ..serving.batcher import HW, InferenceError, InferenceServer, preprocess
from ..serving.codec import (_read_exact, encode_result, make_translation_fns,
                             stream_segment)
from ..serving.endpoints import make_handler

__all__ = ["HW", "InferenceError", "InferenceServer", "preprocess",
           "encode_result", "make_translation_fns", "stream_segment",
           "make_handler", "serve_parse", "main"]


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
