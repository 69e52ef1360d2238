"""Test configuration: simulate an 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 'Distributed')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: this host has a single CPU core and the suite
# jit-compiles dozens of training graphs — cache hits cut repeat runs by ~5x.
# The env var keeps in-suite CLI parses (default --compile_cache_dir=auto)
# inside the same tmp dir instead of writing to the user's real ~/.cache.
# The dir is host-fingerprint-scoped like the package default: XLA:CPU cache
# entries are AOT-compiled for the machine that wrote them, and a /tmp that
# outlives a host/image swap would otherwise feed mismatched-ISA executables
# back (cpu_aot_loader.cc 'could lead to SIGILL' spam, or worse).
from thermal_semantic_segmentation_tpu.core.compile_cache import (  # noqa: E402
    _host_fingerprint)

os.environ.setdefault("TSS_COMPILE_CACHE_DIR",
                      f"/tmp/jax_cache_tss-{_host_fingerprint()}")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["TSS_COMPILE_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
