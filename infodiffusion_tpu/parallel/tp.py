"""Tensor parallelism over the mesh's 'model' axis.

The reference is strictly single-device — no tensor parallelism of any
kind exists to port (SURVEY.md §2.3); ``mesh.py`` reserved a trailing
'model' axis for exactly this. The recipe is pure GSPMD placement (the
jitted train step / sampler is untouched and the math unchanged):

- every weight's output-feature dim — the LAST axis of HWIO conv
  kernels and [in, out] dense kernels — is sharded over 'model' when
  divisible, so the matmul/conv FLOPs split across the axis and XLA
  inserts the collectives (all-gathers where a consumer needs the full
  channel axis, e.g. GroupNorm statistics; reduce-scatters on the
  backward pass) over ICI;
- small tensors (norm scales, biases below ``min_size``) stay
  replicated — sharding them costs more in collective latency than the
  bytes saved;
- composes with FSDP/ZeRO: with ``fsdp=True`` each weight's largest
  remaining dim additionally shards over 'data' (a 2-D
  tensor+fully-sharded layout).

At the flagship's 35M params TP is optional (DP alone saturates the
chip); this is the switch that matters for wider derivatives whose
activations or weights outgrow one chip's HBM.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infodiffusion_tpu.parallel.fsdp import place_state
from infodiffusion_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def tp_param_sharding(
    mesh: Mesh,
    params,
    min_size: int = 2 ** 12,
    fsdp: bool = False,
    fsdp_min_size: int = 2 ** 14,
):
    """NamedSharding pytree: last (output-feature) dim on 'model';
    optionally the largest remaining dim on 'data' (FSDP)."""
    ntp = mesh.shape[MODEL_AXIS]
    ndp = mesh.shape[DATA_AXIS]

    def spec(x):
        axes = [None] * x.ndim
        if (
            ntp > 1
            and x.ndim >= 1
            and x.size >= min_size
            and x.shape[-1] % ntp == 0
        ):
            axes[-1] = MODEL_AXIS
        if fsdp and ndp > 1 and x.size >= fsdp_min_size:
            for d in sorted(range(x.ndim), key=lambda d: -x.shape[d]):
                if axes[d] is None and x.shape[d] % ndp == 0:
                    axes[d] = DATA_AXIS
                    break
        return NamedSharding(mesh, P(*axes))

    return jax.tree.map(spec, params)


def shard_state_tp(mesh: Mesh, state, fsdp: bool = False, **kw):
    """Place a TrainState tensor-parallel (optionally + FSDP): params,
    mirrored optimizer stats and EMA sharded per ``tp_param_sharding``;
    step/rng replicated."""
    return place_state(
        mesh, state, tp_param_sharding(mesh, state.params, fsdp=fsdp, **kw)
    )
