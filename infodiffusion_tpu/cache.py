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
    dryrun) rather than for the TPU behind the tunnel."""
    import jax

    if os.environ.get("INFODIFF_FORCE_CPU"):
        return True
    try:
        cfg = jax.config.jax_platforms
    except AttributeError:  # pragma: no cover
        cfg = None
    platforms = cfg or os.environ.get("JAX_PLATFORMS", "")
    return "cpu" in str(platforms).split(",")


def enable_compilation_cache(path: str | None = None) -> None:
    """Point jax's persistent compilation cache at ``path`` (default
    ~/.cache/infodiff_xla, override INFODIFF_COMPILE_CACHE). CPU-
    destined processes get a per-host-feature subdirectory (see
    host_fingerprint) — TPU entries stay shared, because those
    executables target the chip, not the host. Safe to call again
    after switching platforms (dryrun_multichip does): jax re-points
    the cache on config update."""
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
