"""Host input pipeline: batched, augmented, double-buffer prefetched.

Replaces the reference's torch DataLoader (4 workers, data.py) with a
numpy pipeline tuned for TPU hosts: augmentation (random horizontal
flip) on host, normalization fused into batch assembly, and an
N-deep background prefetcher that overlaps decode/augment with device
compute and lands batches directly in device memory (sharded over the
mesh's data axis when one is given) — the reference instead pays a
``.to(device)`` H2D copy inside its hot loop (run.py:194).

``batch_size`` is always the GLOBAL batch size. Under a mesh the loader
is multi-host-aware: every process draws the same shuffled index order
(same seed), materializes only the rows its local devices own, and
assembles the global sharded ``jax.Array`` via
``parallel.multihost.shard_batch_global`` (single-process this equals a
plain sharded device_put, so the CPU-mesh tests run the pod code path).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pm1_on_device(u8):
    """The pm1 normalize, moved device-side for u8 transfers. XLA
    strength-reduces the divide to a reciprocal multiply, so outputs
    differ from the host ``x.astype(f32)/255*2-1`` by at most one ulp of
    the pre-shift value (measured ≤1.2e-7 absolute over all 256 pixel
    codes) — far inside every behavioral contract (even the D16 turbo
    tolerance is 1/255). The clip pins the RANGE contract exactly
    (without it code 255 lands at 1.0000001). Guarded by
    test_loader_u8_transfer."""
    return jnp.clip(u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0, -1.0, 1.0)


class DataLoader:
    """drop_last=True always, like every reference loader."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        flip: bool = False,
        seed: int = 0,
        mesh=None,
        with_attrs: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.flip = flip
        self.mesh = mesh
        self.with_attrs = with_attrs
        self.prefetch = prefetch
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            return self._rng.permutation(n)
        return np.arange(n)

    def fast_forward(self, n_epochs: int) -> None:
        """Advance the RNG stream past ``n_epochs`` epochs without
        loading any data — exactly the draws __iter__ makes (one
        permutation if shuffling, one flip-mask block if flipping).
        --resume uses this so a resumed run's epoch k sees the SAME
        shuffle order and flip masks the uninterrupted run's epoch k
        saw (the step-noise half of that guarantee comes from keys
        folded from (seed, step), PARITY.md D7)."""
        for _ in range(n_epochs):
            if self.shuffle:
                self._rng.permutation(len(self.dataset))
            if self.flip:
                self._rng.rand(len(self), self.batch_size)
            self._epoch += 1

    def _u8_transfer(self) -> bool:
        """Ship uint8 across H2D and run the pm1 normalize on device —
        4x fewer transfer bytes, f32 values within 1 ulp. Measured on
        the 200k-JPEG rehearsal corpus (v5e via the axon tunnel): the
        producer's per-batch f32 device_put costs ~110 ms/batch;
        loader-only A/B u8 1717.9 vs host-f32 465.3 imgs/s (3.7x), and
        the save_latent stage-2 e2e (decode || jitted Encoder) 1958.5
        vs 341.2 imgs/s (5.7x — STATUS.md round-3 item 7).
        INFODIFF_HOST_NORMALIZE=1 reverts to host-side f32 batches."""
        if os.environ.get("INFODIFF_HOST_NORMALIZE") == "1":
            return False
        ok = getattr(self.dataset, "u8_transfer_ok", None)
        return bool(ok and ok())

    def _assemble(self, idx: np.ndarray, local_rows: np.ndarray,
                  flip_mask=None, u8: bool = False):
        if u8:
            x, a = self.dataset.get_batch_u8(idx[local_rows])
        else:
            x, a = self.dataset.get_batch(idx[local_rows])
        if flip_mask is not None:
            mask = flip_mask[local_rows]
            x[mask] = x[mask, :, ::-1, :]
        return (x, a) if self.with_attrs else x

    def _device_put(self, batch):
        if self.mesh is None:
            return jax.tree.map(
                lambda v: jax.device_put(v) if v is not None else None, batch,
                is_leaf=lambda v: v is None,
            )
        from infodiffusion_tpu.parallel.multihost import shard_batch_global

        return shard_batch_global(self.mesh, batch, self.batch_size)

    def _local_rows(self):
        """Rows of each global batch this process materializes."""
        if self.mesh is None or jax.process_count() == 1:
            return np.arange(self.batch_size)
        from infodiffusion_tpu.parallel.multihost import local_row_indices

        return local_row_indices(self.mesh, self.batch_size)

    def __iter__(self) -> Iterator:
        # ALL RNG consumption happens here, up front, before the
        # producer thread starts: exactly one permutation draw and one
        # flip-mask block per epoch. Drawing lazily inside the producer
        # would make the stream position depend on how far an abandoned
        # iteration prefetched (e.g. the runner peeks one batch to build
        # the train state) — timing-dependent shuffles/flips, and on a
        # multi-host pod DIFFERENT orders per host (desynced global
        # batches). Masks are drawn for GLOBAL batches and sliced per
        # process in _assemble, so every host sees the same decisions —
        # and, because rand(nb, B) consumes the MT19937 stream exactly
        # like nb successive rand(B) calls, the same decisions the
        # per-batch lazy draws produced.
        order = self._order()
        self._epoch += 1
        nb = len(self)
        flip_masks = self._rng.rand(nb, self.batch_size) < 0.5 \
            if self.flip else None
        local_rows = self._local_rows()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item):
            # stop-aware put: a plain q.put would block forever on a full
            # queue when the consumer abandons iteration early (e.g. the
            # preemption exit), leaking the thread + pinned device batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        u8 = self._u8_transfer()

        def _normalize(batch):
            if not u8:
                return batch
            if self.with_attrs:
                x, a = batch
                return (_pm1_on_device(x), a)
            return _pm1_on_device(batch)

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                    mask = flip_masks[b] if flip_masks is not None else None
                    # device_put here so H2D transfer overlaps device
                    # compute (the reference pays .to(device) inside its
                    # hot loop, run.py:194); u8 mode transfers raw bytes
                    # and normalizes device-side (see _u8_transfer)
                    if not put(_normalize(self._device_put(
                        self._assemble(idx, local_rows, mask, u8)
                    ))):
                        return
                put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                # a decode/H2D failure must reach the consumer: dying
                # silently here would leave q.get() blocked forever (a
                # hung training job instead of a crash)
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
