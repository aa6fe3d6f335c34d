"""Device mesh and sharding utilities.

The reference is strictly single-device (CUDA_VISIBLE_DEVICES=0 in every
script; no torch.distributed anywhere — SURVEY.md §2.3). Here data
parallelism is first-class: a 1-D ``data`` mesh, batches sharded along
it, parameters replicated, and XLA inserting the gradient all-reduce
over ICI from the (global-semantics) jitted train step. The mesh keeps a
trailing ``model`` axis so tensor-parallel shardings can be layered in
without an API change.

Global-batch semantics matter here beyond throughput: the MMD loss
couples all examples pairwise (O(B^2)); writing the loss over the global
batch under jit keeps its value identical to single-device while XLA
gathers the (tiny) [B, a_dim] latents over ICI (SURVEY.md §7 hard
parts).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    """(data, model) mesh over the first ``n_devices`` local devices."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n < 1 or n > len(devices):
        raise ValueError(
            f"mesh wants {n} devices but only {len(devices)} are "
            f"available (--mesh_devices)"
        )
    if model_parallel < 1 or n % model_parallel:
        raise ValueError(
            f"tensor-parallel size {model_parallel} (--tp) must divide "
            f"the mesh device count {n}"
        )
    arr = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_1d_mesh(n: int, axis: str, devices=None) -> Mesh:
    """One-axis mesh over the first n devices — used by the PP ('stage')
    and SP ('seq') executors."""
    devices = devices if devices is not None else jax.devices()[:n]
    if len(devices) != n:
        raise ValueError(
            f"'{axis}' mesh wants {n} devices but only {len(devices)} "
            f"are available"
        )
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch (or pytree of arrays) sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
