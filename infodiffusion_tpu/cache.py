"""Persistent XLA compilation cache.

First compiles of the flagship programs take minutes through the axon
remote-compile tunnel; the persistent cache makes every subsequent
process start warm. Called by the CLI, bench and graft entry points.
"""

from __future__ import annotations

import os


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
