"""Orbax checkpointing with full train-state resume.

The reference saves ``state_dict`` weights only — no optimizer state, no
step counter, no resume (reference: run.py:145-158; SURVEY.md §5). Here a
checkpoint is the complete TrainState (params + opt state + step + RNG),
so training resumes bit-exactly. Directory naming keeps the reference's
artifact contract: ``{model_folder}/[vae|diff/]{exp}[_latent]/model-{epoch}``
(reference: run.py:145-158, generate_exp_string utils.py:49-61).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import orbax.checkpoint as ocp

from infodiffusion_tpu.train.state import TrainState


def checkpoint_root(cfg, latent: bool = False) -> str:
    """Reference directory layout (run.py:145-158)."""
    from infodiffusion_tpu.config import generate_exp_string

    root = cfg.model_folder
    if cfg.model == "vae":
        root = os.path.join(root, "vae")
    elif cfg.model == "vanilla":
        root = os.path.join(root, "diff")
    exp = generate_exp_string(cfg)
    if latent:
        exp += "_latent"
    return os.path.abspath(os.path.join(root, exp))


def _path(root: str, epoch: int) -> str:
    return os.path.join(root, f"model-{epoch}")


# one async checkpointer per process: successive async saves must queue
# behind each other (Orbax allows one in-flight save per checkpointer)
_async_ckptr: Optional[ocp.AsyncCheckpointer] = None

# retention deferred past the in-flight async write: deleting older
# epochs while the new one is still persisting would leave ZERO complete
# checkpoints if the process dies mid-write (with keep=1 especially) —
# so retention for an async save runs only once that save is finalized
# (at the next save's barrier, or wait_for_saves)
_pending_retention: Optional[tuple] = None


def _get_async_ckptr() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def _flush_pending_retention() -> None:
    global _pending_retention
    if _pending_retention is not None:
        root, keep, epoch = _pending_retention
        _pending_retention = None
        _apply_retention(root, keep, current=epoch)


def wait_for_saves() -> None:
    """Barrier for in-flight async checkpoint writes (call at train end
    and before a preemption exit)."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    _flush_pending_retention()


def save_checkpoint(
    root: str,
    epoch: int,
    state: TrainState,
    *,
    async_save: bool = False,
    keep: Optional[int] = None,
) -> str:
    """Write the full train state to ``root/model-{epoch}``.

    ``async_save``: device->host copy happens synchronously (so donated
    buffers of the next step can't corrupt it), persistence continues in
    the background — the train loop keeps stepping during the write.
    ``keep``: retention — delete all but the newest ``keep`` epochs
    after saving (the reference keeps every weights file; production
    runs at save_epochs=1 want a bound).
    """
    global _pending_retention
    path = _path(root, epoch)
    if async_save:
        ckptr = _get_async_ckptr()
        ckptr.wait_until_finished()  # at most one save in flight
        _flush_pending_retention()  # previous save is finalized now
    else:
        ckptr = ocp.StandardCheckpointer()
    if jax.process_count() > 1 or async_save:
        # global jax.Arrays straight to Orbax: multi-host saves must be
        # collective (device_get raises on non-addressable shards), and
        # async saves need Orbax's own sync snapshot of device memory
        ckptr.save(path, state, force=True)
    else:
        ckptr.save(path, jax.device_get(state), force=True)
    if not async_save:
        ckptr.wait_until_finished()
    if keep is not None:
        if async_save:
            _pending_retention = (root, keep, epoch)
        else:
            _apply_retention(root, keep, current=epoch)
    return path


def _apply_retention(root: str, keep: int, current: int) -> None:
    """Delete all but the newest ``keep`` checkpoint epochs under root.
    ``current`` (the epoch just saved) counts even though an async write
    may not have materialized its directory yet; it is never deleted."""
    import shutil

    if jax.process_index() != 0:
        return
    epochs = {current}
    for name in os.listdir(root) if os.path.isdir(root) else []:
        m = re.fullmatch(r"model-(\d+)", name)
        if m and os.path.isdir(os.path.join(root, name)):
            epochs.add(int(m.group(1)))
    doomed = sorted(epochs)[:-keep] if keep > 0 else []
    for e in doomed:
        if e != current:
            shutil.rmtree(os.path.join(root, f"model-{e}"), ignore_errors=True)


def latest_checkpoint_epoch(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    epochs = []
    for name in os.listdir(root):
        m = re.fullmatch(r"model-(\d+)", name)
        if m and os.path.isdir(os.path.join(root, name)):
            epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None


def restore_checkpoint(root: str, epoch: int, target: TrainState) -> TrainState:
    """Restore into the structure of ``target`` (a freshly-initialized
    state with the right shapes/shardings)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_path(root, epoch), target)


def restore_params(root: str, epoch: int, target_params,
                   prefer_ema: bool = True):
    """Weights-only restore for eval modes, shaped by ``target_params``
    (the reference loads with strict=False to skip its dead CrossAttn
    params, run.py:233; our checkpoints carry no dead weights so an
    exact-shape restore suffices). When the checkpoint carries EMA
    params (trained with --ema_decay) they are preferred."""
    path = _path(root, epoch)
    if not os.path.isdir(path):
        have = latest_checkpoint_epoch(root)
        hint = (
            f"latest saved epoch there is {have} — pass -e/--epochs {have}"
            if have is not None
            else f"no checkpoints under {root} — train first (--mode train)"
        )
        raise FileNotFoundError(
            f"Checkpoint {path} not found: eval modes load model-{{--epochs}}; {hint}."
        )
    ckptr = ocp.StandardCheckpointer()
    # weights-only partial read: the full checkpoint is ~3-5x the params
    # bytes (AdamW mu/nu + EMA + RNG); eval needs exactly one subtree.
    # Metadata (no tensor data) decides the params-vs-EMA pick first.
    try:
        import warnings

        tree = ckptr.metadata(path).item_metadata.tree
        key = (
            "ema_params"
            if prefer_ema and tree.get("ema_params") is not None
            else "params"
        )
        # sanity BEFORE the partial read: with transforms={} Orbax fills
        # unmatched leaves from the item itself, so a structure mismatch
        # would silently hand back the caller's (random-init) target
        # params instead of raising
        jax.tree.map(lambda a, b: None, tree[key], target_params)
        item = {key: target_params}
        restore_args = jax.tree.map(lambda _: ocp.RestoreArgs(), item)
        with warnings.catch_warnings():
            # single-host eval restore: the "sharding info from file" and
            # transforms-API notes are expected here, not actionable
            warnings.simplefilter("ignore")
            out = ocp.PyTreeCheckpointer().restore(
                path, item=item, transforms={}, restore_args=restore_args
            )
        return out[key]
    except Exception:
        # fall back to the full-state read (older checkpoint layouts);
        # a genuine structure mismatch re-raises from tree.map below
        restored = ckptr.restore(path)
        params = restored["params"]
        if prefer_ema and restored.get("ema_params") is not None:
            params = restored["ema_params"]
        # sanity: structure must match the model being evaluated
        jax.tree.map(lambda a, b: None, params, target_params)
        return params
