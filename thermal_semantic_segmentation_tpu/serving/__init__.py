"""TPU-native inference serving: micro-batcher, wire codec, HTTP endpoints.

A deployment surface the reference lacks (it is a research repo with no
serving story). The CLI front-end lives in ``cli/serve.py``; these modules
hold the reusable pieces: :mod:`.batcher` (request coalescing into one
compiled batch shape), :mod:`.codec` (result encoding + the streaming wire
format and its reference client), :mod:`.endpoints` (the HTTP handler).
"""

from .batcher import HW, InferenceError, InferenceServer, preprocess
from .codec import encode_result, make_translation_fns, stream_segment
from .endpoints import make_handler

__all__ = ["HW", "InferenceError", "InferenceServer", "preprocess",
           "encode_result", "make_translation_fns", "stream_segment",
           "make_handler"]
