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


def host_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU target features.

    CPU-backend cache entries are AOT executables compiled for the
    exact machine features of the compiling host; reusing them across
    heterogeneous machines makes XLA's cpu_aot_loader reject every
    entry ("Compile machine features ... doesn't match", with a SIGILL
    risk if the check were ever bypassed) — observed in the round-4
    multichip dryrun tail. CPU cache dirs are therefore keyed by this
    fingerprint: a different host simply gets a fresh subdirectory and
    rebuilds, instead of tripping over another machine's artifacts."""
    import hashlib
    import platform

    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes 'flags', aarch64 'Features'
                if line.startswith(("flags", "Features")):
                    bits.append(
                        " ".join(sorted(line.split(":", 1)[1].split()))
                    )
                    break
    except OSError:  # non-Linux: machine() alone still separates arches
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:8]


def _cpu_destined() -> bool:
    """Whether jitted programs in this process will compile for the
    host CPU (forced-CPU runs, the CPU test suite, the multichip
    dryrun, or a host whose only backend IS the CPU) rather than for
    the TPU behind the tunnel."""
    import jax

    if os.environ.get("INFODIFF_FORCE_CPU"):
        return True
    try:
        cfg = jax.config.jax_platforms
    except AttributeError:  # pragma: no cover
        cfg = None
    platforms = str(cfg or os.environ.get("JAX_PLATFORMS", ""))
    if platforms:
        return "cpu" in platforms.split(",")
    # no platform pin at all: resolve the real backend (hosts without
    # an accelerator fall back to CPU and must still get the host-keyed
    # dir — the cost is initializing the backend here, which every
    # caller does moments later anyway)
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover — backend init failure
        return False


def enable_compilation_cache(path: str | None = None) -> None:
    """Point jax's persistent compilation cache at ``path`` (default
    ~/.cache/infodiff_xla, override INFODIFF_COMPILE_CACHE). CPU-
    destined processes get a per-host-feature subdirectory (see
    host_fingerprint) — TPU entries stay shared, because those
    executables target the chip, not the host.

    Call-again semantics: jax latches the cache object at the first
    compile (jax._src.compilation_cache._initialize_cache), so a bare
    config update after that is silently ignored; this function also
    resets the latch (guarded — private API) so re-pointing after a
    platform switch (dryrun_multichip does this before its first
    compile anyway) actually takes effect."""
    import jax

    cache_dir = path or os.environ.get(
        "INFODIFF_COMPILE_CACHE", os.path.expanduser("~/.cache/infodiff_xla")
    )
    if _cpu_destined():
        cache_dir = os.path.join(cache_dir, f"host-{host_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: non-fatal
    try:  # un-latch an already-initialized cache so the new dir is live
        from jax._src import compilation_cache as _cc

        if getattr(_cc, "_cache_initialized", False):
            _cc.reset_cache()
    except Exception:
        pass  # private API drifted: the config update above still
        # covers every caller that re-points before the first compile
