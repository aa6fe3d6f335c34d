"""Persistent XLA compilation cache.

First compiles of the flagship programs take minutes through the axon
remote-compile tunnel; the persistent cache makes every subsequent
process start warm. Called by the CLI, bench and graft entry points.
"""

from __future__ import annotations

import os


def force_cpu_if_requested() -> None:
    """INFODIFF_FORCE_CPU=1: deterministic CPU runs (CI, or driving any
    CLI entry point while the TPU tunnel is down). Env alone is not
    enough on hosts that pin a platform via sitecustomize — the config
    knob must be set too (works even after jax import: the backend
    initializes lazily on first use). Every CLI entry point (cli.main,
    gen_fid_stats, calc_fid, eval_disentanglement) calls this first."""
    if os.environ.get("INFODIFF_FORCE_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "INFODIFF_COMPILE_CACHE", os.path.expanduser("~/.cache/infodiff_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: non-fatal
