"""Persistent XLA compilation cache wiring (core/compile_cache.py).

The reference has no compile step to cache; this is TPU-native
infrastructure: multi-stage recipes and preemption resumes skip XLA
recompiles entirely when the cache is on (verified through the axon
TPU plugin on chip; here the CPU backend proves the same plumbing).
"""

import os

import jax
import jax.numpy as jnp
import pytest

from thermal_semantic_segmentation_tpu.core.compile_cache import (
    default_cache_dir, enable_compile_cache)


@pytest.fixture
def restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
    # drop any live cache binding to this test's tmp dir so later tests
    # lazily re-initialize against the restored config
    from jax.experimental.compilation_cache import compilation_cache
    compilation_cache.reset_cache()


def test_enable_persists_compiled_executables(tmp_path, restore_cache_config):
    d = str(tmp_path / "xla")
    assert enable_compile_cache(d, min_compile_time_secs=0.0) == d
    assert jax.config.jax_compilation_cache_dir == d

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T) * 3.14159

    float(f(jnp.ones((32, 32))).sum())
    entries = os.listdir(d)
    assert any("jit_f" in e for e in entries), entries


def test_enable_rebinds_an_already_initialized_cache(tmp_path,
                                                     restore_cache_config):
    """jax initializes its cache object at most once per process; without an
    explicit reset, re-pointing jax_compilation_cache_dir mid-process keeps
    writing entries to the FIRST directory (the round-3 order-dependent
    flake: test_cli_chain bound the cache, then the entries test watched an
    empty dir). enable_compile_cache must rebind the live object."""
    d1, d2 = str(tmp_path / "one"), str(tmp_path / "two")
    enable_compile_cache(d1, min_compile_time_secs=0.0)

    @jax.jit
    def g(x):
        return jnp.cosh(x @ x.T) * 2.71828

    float(g(jnp.ones((16, 16))).sum())
    assert any("jit_g" in e for e in os.listdir(d1))

    enable_compile_cache(d2, min_compile_time_secs=0.0)

    @jax.jit
    def h(x):
        return jnp.sinh(x @ x.T) * 1.41421

    float(h(jnp.ones((16, 16))).sum())
    assert any("jit_h" in e for e in os.listdir(d2)), os.listdir(d2)
    assert not any("jit_h" in e for e in os.listdir(d1))


def test_empty_and_off_disable(restore_cache_config):
    for v in ("", "off", "none", "0"):
        assert enable_compile_cache(v) is None
        assert jax.config.jax_compilation_cache_dir is None


def test_default_dir_honors_env(monkeypatch, tmp_path):
    monkeypatch.setenv("TSS_COMPILE_CACHE_DIR", str(tmp_path / "env"))
    assert default_cache_dir() == str(tmp_path / "env")
    monkeypatch.delenv("TSS_COMPILE_CACHE_DIR")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    assert default_cache_dir().startswith(str(tmp_path / "xdg"))


def test_cli_flag_reaches_jax_config(tmp_path, restore_cache_config):
    from thermal_semantic_segmentation_tpu.cli.options import seg_parse
    d = str(tmp_path / "cli_cache")
    seg_parse().parse_args(["--compile_cache_dir", d])
    assert jax.config.jax_compilation_cache_dir == d
    # empty string = off (parse leaves whatever was configured untouched,
    # it never force-clears another stage's cache when CLIs chain)
    enable_compile_cache("")
    seg_parse().parse_args(["--compile_cache_dir", ""])
    assert jax.config.jax_compilation_cache_dir is None
