"""Shared opt-in gate for the Pallas kernel tier.

All kernels measured BEHIND XLA's own fusions on v5e (round 1), so XLA
is the default everywhere and the kernels are opt-in:

- ``INFODIFF_ENABLE_PALLAS=1``      : adagn / attention kernels
  (MMD has no Pallas kernel — ops/mmd.py is the XLA dot-general form).
- ``INFODIFF_ENABLE_FUSED_LATENT=1``: the whole-forward latent-MLP
  kernel (ops/pallas/latent_mlp.py) — gated separately because it is a
  known ~10% pessimization vs XLA (kept as a parity-tested alternative),
  and bundling it under the umbrella flag would silently slow users who
  enable Pallas hoping for wins elsewhere.
- ``INFODIFF_ENABLE_FUSED_SHORTCUT=1``: the fused residual+shortcut
  epilogue (ops/pallas/shortcut_fused.py) — also separately gated and a
  known ~33% end-to-end pessimization; kept as the measured evidence
  that single-op extraction loses to XLA's global layout/fusion
  planning at this model scale (fusion-boundary analysis in its
  docstring).
- ``INFODIFF_DISABLE_PALLAS=1``     : force the XLA paths everywhere.

Two kernels run by DEFAULT on TPU because they measured ahead of XLA
(each with its own revert flag, not the umbrella opt-in):

- the whole-trajectory latent sampler (ops/pallas/latent_traj.py,
  round 2: +16% end-to-end; ``INFODIFF_DISABLE_FUSED_LATENT_TRAJ=1``)
- flash attention for LARGE token counts only
  (ops/pallas/flash_attention.py, round 4, N >=
  ``INFODIFF_FLASH_ATTN_MIN_TOKENS`` — beyond-reference resolutions;
  the reference-scale N=256 sites stay on the measured XLA path;
  ``INFODIFF_DISABLE_FLASH_ATTENTION=1``)
"""

from __future__ import annotations

import contextlib
import math
import os

import jax

# Process-global record of the mesh the surrounding program is sharded
# over (samplers' mesh path, the runner's dp/fsdp/tp train step). A
# pallas_call traced under a GSPMD-sharded jit is NOT validated to
# partition over the mesh (it may replicate or fail), so a default-ON
# kernel must check active_mesh_size() in its own gate and refuse when
# a non-trivial mesh is active — the XLA path, which GSPMD partitions
# natively, runs instead. Currently flash_attention.flash_enabled is
# the ONLY consumer: the other default-ON kernel (the whole-trajectory
# latent sampler) is excluded at construction when a mesh is present
# (LatentDiffusionProcess: mesh path = XLA scan), not via this scope.
# A new default-ON kernel must add its own active_mesh_size() check —
# the scope alone protects nothing. Same process-global pattern as
# parallel/sp.py (round-4 advisor finding on flash attention under
# sharded sampling).
_MESH_STATE = {"size": 1}


def active_mesh_size() -> int:
    return _MESH_STATE["size"]


@contextlib.contextmanager
def mesh_compute_scope(mesh):
    """Mark a region whose jitted programs are sharded over ``mesh``
    (None or a 1-device mesh = trivial, leaves kernels enabled)."""
    size = 1
    if mesh is not None:
        size = int(math.prod(mesh.shape.values())) if mesh.shape else 1
    prev = _MESH_STATE["size"]
    _MESH_STATE["size"] = size
    try:
        yield
    finally:
        _MESH_STATE["size"] = prev


def pallas_enabled(env_var: str = "INFODIFF_ENABLE_PALLAS") -> bool:
    if os.environ.get("INFODIFF_DISABLE_PALLAS"):
        return False
    if not os.environ.get(env_var):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
