"""Multi-host (multi-process) execution support.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3:
``CUDA_VISIBLE_DEVICES=0`` in every script, no torch.distributed). On
TPU pods, JAX runs one Python process per host, each seeing only its
local chips; scaling past one host needs three things, all provided
here:

1. runtime init — ``jax.distributed.initialize()`` so every process
   sees the global device set (``maybe_initialize``, driven by
   ``--multihost`` or the standard JAX coordinator env vars);
2. per-process input sharding — each host materializes only the rows of
   the global batch that its local chips own (``local_row_indices``);
   all hosts draw the same shuffled index order (same ``--r_seed``), so
   the union over hosts is exactly the global batch;
3. global-array assembly — host-local rows become one sharded
   ``jax.Array`` spanning the pod (``shard_batch_global``) that the
   jitted global-semantics train step consumes unchanged; XLA inserts
   the gradient all-reduce and the MMD latent all-gather over ICI.

``shard_batch_global`` is also the single-process sharding path, so the
8-device CPU-mesh tests exercise the exact code multi-host runs.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import numpy as np

from infodiffusion_tpu.parallel.mesh import batch_sharding


def maybe_initialize(multihost: bool = False) -> bool:
    """Start the JAX distributed runtime when multi-host is requested.

    Explicit opt-in via ``--multihost`` / ``INFODIFF_MULTIHOST=1``, or
    implicit when the standard coordinator env vars are present (e.g.
    set by the TPU pod launcher). Safe no-op if already initialized or
    when running single-process.
    """
    want = (
        multihost
        or os.environ.get("INFODIFF_MULTIHOST") == "1"
        or "JAX_COORDINATOR_ADDRESS" in os.environ
        or "COORDINATOR_ADDRESS" in os.environ
    )
    if not want:
        return False
    try:
        jax.distributed.initialize()
        return True
    except RuntimeError as exc:
        # already initialized (jax raises "...should only be called once.")
        msg = str(exc).lower()
        if "already" in msg or "once" in msg:
            return True
        raise


def is_main_process() -> bool:
    return jax.process_index() == 0


def _device_rows(sharding, global_batch: int):
    """[(device, (start, stop)), ...] for every device of the sharding,
    from its batch-axis index map."""
    out = []
    for dev, idx in sharding.devices_indices_map((global_batch,)).items():
        sl = idx[0]
        start = 0 if sl.start is None else sl.start
        stop = global_batch if sl.stop is None else sl.stop
        out.append((dev, (start, stop)))
    return out


def local_row_indices(mesh, global_batch: int) -> np.ndarray:
    """Global-batch row indices owned by this process's local devices
    (sorted). Over all processes these partition ``range(global_batch)``;
    each host feeds exactly these rows to :func:`shard_batch_global`."""
    sh = batch_sharding(mesh)
    rows = []
    for dev, (start, stop) in _device_rows(sh, global_batch):
        if dev.process_index == jax.process_index():
            rows.append(np.arange(start, stop))
    if not rows:
        return np.empty((0,), np.int64)
    return np.unique(np.concatenate(rows))


@functools.lru_cache(maxsize=16)
def _shard_plan(mesh, global_batch: int):
    """Per-(mesh, global_batch) placement plan: sharding, expected local
    row count, and this process's (device, local_start, length) slices.
    mesh and global_batch are fixed for a run's lifetime, and this runs
    once per training batch inside the prefetch thread — recomputing
    the devices_indices_map walk per leaf per step is O(devices) host
    work for nothing on large pods."""
    sh = batch_sharding(mesh)
    rows = local_row_indices(mesh, global_batch)
    offset = {int(r): i for i, r in enumerate(rows)}
    mine = tuple(
        (dev, offset[start], stop - start)
        for dev, (start, stop) in _device_rows(sh, global_batch)
        if dev.process_index == jax.process_index()
    )
    return sh, len(rows), mine


def shard_batch_global(mesh, local_batch, global_batch: int | None = None):
    """Build a global batch-sharded ``jax.Array`` (or pytree of them)
    from this process's local rows.

    ``local_batch`` holds the rows :func:`local_row_indices` named, in
    ascending global order. Single-process, that is the whole batch and
    this equals ``device_put(batch, batch_sharding(mesh))``; the unified
    path keeps CPU-mesh tests on the multi-host code.
    """

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        gb = (
            x.shape[0] * jax.process_count()
            if global_batch is None
            else global_batch
        )
        sh, n_rows, mine = _shard_plan(mesh, gb)
        if n_rows != x.shape[0]:
            raise ValueError(
                f"local batch has {x.shape[0]} rows; this process's "
                f"devices own {n_rows} of the global {gb}"
            )
        arrays = [
            jax.device_put(x[lo : lo + ln], dev) for dev, lo, ln in mine
        ]
        return jax.make_array_from_single_device_arrays(
            (gb,) + x.shape[1:], sh, arrays
        )

    return jax.tree.map(put, local_batch, is_leaf=lambda v: v is None)


def process_allgather(x) -> np.ndarray:
    """Host-side gather of per-process arrays (eval/save_latent on
    pods); identity single-process."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def agree_on_preemption(local_flag: bool) -> bool:
    """Cross-host agreement on the preemption decision: True iff ANY
    process saw the signal. On a pod, hosts receive SIGTERM at slightly
    different times; acting on the host-local flag alone would have one
    process leave the step loop while the rest enter the next gradient
    all-reduce and deadlock. Every process must call this at the same
    step boundaries (a collective). Single-process: the flag itself."""
    if jax.process_count() == 1:
        return bool(local_flag)
    flags = process_allgather(np.array([1 if local_flag else 0], np.int32))
    return bool(np.any(flags))


def require_single_process(what: str) -> None:
    """Eval/scoring drivers fetch full arrays to host and write artifact
    files; they are single-host by design (train is the multi-host
    surface). Fail fast with a clear message instead of crashing on a
    non-addressable-array fetch deep inside."""
    if jax.process_count() > 1:
        raise RuntimeError(
            f"{what} runs single-host: launch it without --multihost "
            f"(training is the multi-host path; SURVEY.md §2.3)"
        )
