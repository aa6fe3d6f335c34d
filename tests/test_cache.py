"""Compile-cache host keying (infodiffusion_tpu/cache.py): CPU-destined
processes must get a per-host-feature cache subdirectory so CPU AOT
executables are never loaded across heterogeneous machines (round-4
multichip dryrun tail: cpu_aot_loader 'Compile machine features ...
doesn't match' spam)."""

import os

import jax

from infodiffusion_tpu.cache import (
    _cpu_destined,
    enable_compilation_cache,
    host_fingerprint,
)


def test_host_fingerprint_stable_and_short():
    fp = host_fingerprint()
    assert fp == host_fingerprint()
    assert len(fp) == 8
    int(fp, 16)  # hex


def test_cpu_destined_on_test_backend():
    # conftest forces the CPU platform for the suite
    assert _cpu_destined()


def test_cpu_cache_dir_is_host_keyed(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path))
        got = jax.config.jax_compilation_cache_dir
        assert got == str(tmp_path / f"host-{host_fingerprint()}")
        assert os.path.isdir(got)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_tpu_cache_dir_stays_shared(tmp_path, monkeypatch):
    """TPU executables target the chip, not the host — the shared dir
    must survive (cold flagship compiles cost 6-10 min through the
    tunnel; per-host TPU dirs would throw that warmth away)."""
    import infodiffusion_tpu.cache as cache_mod

    monkeypatch.setattr(cache_mod, "_cpu_destined", lambda: False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
