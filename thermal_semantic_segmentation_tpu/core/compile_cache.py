"""Persistent XLA compilation cache wiring.

The reference pays no compile cost (eager torch); here every entry point
jit-compiles its step functions, and over a remote-tunneled TPU backend a
large graph can take minutes to build (the fused CycleGAN step measured
~10 min at 256x512, CLAUDE.md).  JAX can persist serialized executables
keyed by (HLO, jaxlib/backend fingerprint) so a FRESH PROCESS re-running
the same program skips XLA entirely — verified to work through the axon
TPU plugin (cache entries serialize and reload).  That converts the
multi-stage recipes (GAN -> translator -> seg -> pseudo -> prototypes ->
self-train), preemption resumes, and repeated bench/gate runs from
recompile-every-stage into compile-once.

Entry points enable this at parse time via the common
``--compile_cache_dir`` flag (cli/options.py); default is a per-user
cache dir, empty string disables.  Safe to call before or after backend
init: the config keys are consulted lazily at each compile.
"""

from __future__ import annotations

import os
from typing import Optional

_DISABLE = ("", "none", "off", "0")


def _rebind_live_cache(path: Optional[str]) -> None:
    """Reset jax's module-level cache object when it is bound elsewhere.

    jax initializes its persistent-cache object AT MOST ONCE per process
    (jax._src.compilation_cache._initialize_cache): the first eligible
    compile binds it to whatever jax_compilation_cache_dir held at that
    moment, and every later ``jax.config.update`` of the dir is silently
    ignored — entries keep landing in the first directory.  Chained CLIs
    in one process (bench gates, the pytest suite) re-point the cache, so
    whenever the requested path differs from the live binding we reset the
    object; the next compile re-initializes it lazily from the config.
    """
    try:
        from jax.experimental.compilation_cache import compilation_cache as cc
        from jax._src import compilation_cache as cc_internal
    except Exception:  # pragma: no cover - future jax reorganisation
        return
    live = getattr(cc_internal, "_cache", None)
    if live is None:
        return
    if path is None or str(getattr(live, "_path", None)) != str(path):
        cc.reset_cache()


def _host_fingerprint() -> str:
    """Short hash of the host's CPU architecture + ISA feature flags.

    XLA:CPU cache entries are AOT-compiled for the machine that wrote them;
    executing one on a host with different ISA features can SIGILL
    (cpu_aot_loader.cc:210 refuses with an error log). Scoping the default
    cache dir by this fingerprint makes cross-machine reuse (shared NFS
    homes, container image drift) structurally impossible.
    """
    import hashlib
    import platform

    blob = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    blob += line
                    break
    except OSError:
        pass
    return hashlib.sha256(blob.encode()).hexdigest()[:8]


def default_cache_dir() -> str:
    """``$TSS_COMPILE_CACHE_DIR`` if set, else a per-user XDG cache dir
    scoped by a host fingerprint (see :func:`_host_fingerprint`)."""
    env = os.environ.get("TSS_COMPILE_CACHE_DIR")
    if env is not None:
        return env
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "thermal_semantic_segmentation_tpu",
                        "xla-" + _host_fingerprint())


def enable_compile_cache(cache_dir: Optional[str] = None,
                         min_compile_time_secs: float = 1.0) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    ``None`` resolves :func:`default_cache_dir`; an empty/'off' value
    disables the cache (clears the config) and returns None.  Entries
    cheaper than ``min_compile_time_secs`` are not persisted — tiny
    op-by-op compiles would otherwise spam the directory for no win.
    Returns the directory in effect.
    """
    import jax

    if cache_dir is None:
        cache_dir = default_cache_dir()
    cache_dir = cache_dir.strip()
    if cache_dir.lower() in _DISABLE:
        jax.config.update("jax_compilation_cache_dir", None)
        _rebind_live_cache(None)
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    _rebind_live_cache(cache_dir)
    return cache_dir
