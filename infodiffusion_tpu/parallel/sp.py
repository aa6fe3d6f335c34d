"""Sequence-parallel attention routing (--sp).

Round-1 built ring attention (parallel/ring_attention.py) as a toolbox
capability; this module wires it into the PRODUCT path: when an SP
context is configured (CLI --sp N, or ``sp_scope`` programmatically),
``ops.attention.single_head_attention`` routes through the ring kernel
whenever the token count reaches the threshold — the 128px+ regime
where the attn-level grid is >= 32x32 = 1024 tokens (the reference's
attention is a dense softmax(q k^T) over exactly these tokens,
reference: modules.py:145-164; at 64px it is only 256 tokens and dense
stays optimal).

The config is process-global (like the Pallas gating in ops/gating.py)
so model code stays oblivious: AttnBlock calls the same op either way.
Threshold: INFODIFF_SP_MIN_TOKENS (default 1024). Token counts that
do not divide the mesh axis fall back to dense with a warning —
a silent perf cliff otherwise (same policy as samplers._shard_for_mesh).
"""

from __future__ import annotations

import contextlib
import os
import warnings
from typing import Optional

from jax.sharding import Mesh

# single source of truth for the axis name: the mesh builder
# (ring_attention.make_seq_mesh) and this router must agree
from infodiffusion_tpu.parallel.ring_attention import SEQ_AXIS

_STATE = {"mesh": None, "axis": SEQ_AXIS, "min_tokens": None}


def _default_min_tokens() -> int:
    return int(os.environ.get("INFODIFF_SP_MIN_TOKENS", "1024"))


def configure_sp(
    mesh: Optional[Mesh],
    axis: str = SEQ_AXIS,
    min_tokens: Optional[int] = None,
) -> None:
    """Set (mesh is a Mesh) or clear (mesh is None) the global SP
    context."""
    _STATE["mesh"] = mesh
    _STATE["axis"] = axis
    _STATE["min_tokens"] = min_tokens


@contextlib.contextmanager
def sp_scope(
    mesh: Optional[Mesh],
    axis: str = SEQ_AXIS,
    min_tokens: Optional[int] = None,
):
    prev = dict(_STATE)
    configure_sp(mesh, axis=axis, min_tokens=min_tokens)
    try:
        yield
    finally:
        _STATE.update(prev)


def sp_route(n_tokens: int):
    """(mesh, axis) when ring attention should handle an ``n_tokens``
    attention, else None."""
    mesh = _STATE["mesh"]
    if mesh is None:
        return None
    mt = _STATE["min_tokens"]
    if mt is None:
        mt = _default_min_tokens()
    if n_tokens < mt:
        return None
    axis = _STATE["axis"]
    size = int(mesh.shape[axis])
    if n_tokens % size:
        warnings.warn(
            f"sequence-parallel attention skipped: {n_tokens} tokens do "
            f"not divide the {size}-way '{axis}' mesh axis — falling "
            "back to dense attention",
            stacklevel=3,
        )
        return None
    return mesh, axis
