"""Multi-host plumbing tests (single-process: jax.process_count()==1).

The pod-only pieces (N processes, coordinator) can't run here, but the
whole data path multi-host uses — local_row_indices -> per-device
assembly -> make_array_from_single_device_arrays — runs identically
single-process on the 8-device CPU mesh, where it must bit-match the
plain sharded device_put it replaces.
"""

import numpy as np
import jax
import jax.numpy as jnp

from infodiffusion_tpu.parallel import make_mesh
from infodiffusion_tpu.parallel.mesh import batch_sharding
from infodiffusion_tpu.parallel.multihost import (
    local_row_indices,
    maybe_initialize,
    process_allgather,
    shard_batch_global,
)


def test_local_rows_partition_the_batch():
    for mesh in (make_mesh(8), make_mesh(8, model_parallel=2)):
        rows = local_row_indices(mesh, 32)
        # single process owns everything; rows sorted and complete
        np.testing.assert_array_equal(rows, np.arange(32))


def test_shard_batch_global_matches_device_put():
    x = np.arange(16 * 3 * 4, dtype=np.float32).reshape(16, 3, 4)
    for mesh in (make_mesh(8), make_mesh(8, model_parallel=2)):
        got = shard_batch_global(mesh, x, 16)
        want = jax.device_put(x, batch_sharding(mesh))
        assert got.sharding.is_equivalent_to(want.sharding, x.ndim)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_shard_batch_global_pytree_with_none():
    mesh = make_mesh(8)
    x = np.ones((8, 2), np.float32)
    a = np.arange(8, dtype=np.int32)
    out_x, out_a, out_none = shard_batch_global(mesh, (x, a, None), 8)
    assert out_none is None
    np.testing.assert_array_equal(np.asarray(out_x), x)
    np.testing.assert_array_equal(np.asarray(out_a), a)


def test_shard_batch_global_rejects_wrong_local_count():
    mesh = make_mesh(8)
    import pytest

    with pytest.raises(ValueError, match="local batch"):
        shard_batch_global(mesh, np.ones((4, 2), np.float32), 16)


def test_global_array_feeds_jit_reduction():
    mesh = make_mesh(8)
    x = np.arange(32, dtype=np.float32).reshape(32, 1)
    gx = shard_batch_global(mesh, x, 32)
    # a global-semantics jitted reduction sees the full batch
    assert float(jnp.sum(gx)) == float(x.sum())


def test_loader_under_mesh_uses_global_assembly():
    from infodiffusion_tpu.data.datasets import ArrayDataset
    from infodiffusion_tpu.data.loader import DataLoader

    imgs = np.random.RandomState(0).randint(
        0, 256, (64, 8, 8, 1), dtype=np.uint8
    )
    ds = ArrayDataset(images=imgs)

    mesh = make_mesh(8)
    batches_mesh = [
        np.asarray(b)
        for b in DataLoader(ds, 16, shuffle=True, seed=3, mesh=mesh)
    ]
    batches_host = [
        np.asarray(b) for b in DataLoader(ds, 16, shuffle=True, seed=3)
    ]
    assert len(batches_mesh) == len(batches_host) == 4
    for got, want in zip(batches_mesh, batches_host):
        np.testing.assert_array_equal(got, want)


def test_loader_u8_normalize_preserves_mesh_sharding():
    """The device-side pm1 normalize (u8 H2D path, PARITY.md D21) must
    keep the batch sharded over the data axis — a regression that
    replicated it would multiply per-device batch memory by the mesh
    size silently (jit of an elementwise op preserves input sharding;
    this pins that contract for the loader's output)."""
    from infodiffusion_tpu.data.datasets import ArrayDataset
    from infodiffusion_tpu.data.loader import DataLoader

    imgs = np.random.RandomState(1).randint(
        0, 256, (32, 8, 8, 1), dtype=np.uint8
    )
    ds = ArrayDataset(images=imgs)
    assert ds.u8_transfer_ok()
    mesh = make_mesh(8)
    want = batch_sharding(mesh)
    for b in DataLoader(ds, 16, mesh=mesh):
        assert b.dtype == jnp.float32
        assert b.sharding.is_equivalent_to(want, b.ndim), b.sharding


def test_maybe_initialize_noop_without_request(monkeypatch):
    monkeypatch.delenv("INFODIFF_MULTIHOST", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize(False) is False


def test_process_allgather_identity_single_process():
    x = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(process_allgather(x), x)


def test_agree_on_preemption_single_process():
    from infodiffusion_tpu.parallel.multihost import agree_on_preemption

    assert agree_on_preemption(True) is True
    assert agree_on_preemption(False) is False


def test_require_single_process_is_noop_here():
    from infodiffusion_tpu.parallel.multihost import require_single_process

    require_single_process("--mode eval")  # process_count()==1: no raise


def test_disabled_metrics_writer_writes_nothing(tmp_path):
    from infodiffusion_tpu.logging_utils import MetricsWriter

    w = MetricsWriter(str(tmp_path / "logs"), enabled=False)
    w.write(0, {"loss": 1.0})
    w.flush()
    w.close()
    assert not (tmp_path / "logs").exists()


def test_loader_abandoned_iteration_releases_producer():
    import gc
    import threading
    import time

    from infodiffusion_tpu.data.datasets import ArrayDataset
    from infodiffusion_tpu.data.loader import DataLoader

    imgs = np.zeros((64, 4, 4, 1), np.uint8)
    loader = DataLoader(ArrayDataset(images=imgs), 8, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-epoch (the preemption exit path)
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before
