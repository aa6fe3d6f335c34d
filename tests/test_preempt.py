"""Preemption-safe training (SURVEY.md §5: the reference has no
failure-recovery story — weights-only checkpoints, no resume).

SIGTERM (the pod preemption notice) or the INFODIFF_PREEMPT_AFTER_STEPS
fault-injection hook checkpoint the FULL train state at the next step
boundary and exit cleanly; --resume continues from it.
"""

import os
import signal

import numpy as np
import pytest

from infodiffusion_tpu.cli import dispatch, parse_args
from infodiffusion_tpu import runner


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("INFODIFF_SYNTHETIC_DATA", "1")
    monkeypatch.setenv("INFODIFF_SYNTHETIC_N", "64")
    return tmp_path


def _latent_cfg(extra=()):
    # the latent-DDIM trainer is the cheapest real train loop (MLP)
    a = np.random.RandomState(0).randn(64, 8).astype(np.float32)
    np.savez("diff_mnist_8d_0_1mmd_latent", all_a=a, all_attr=np.zeros(64))
    return parse_args([
        "--model", "diff", "--mode", "train_latent_ddim",
        "--prior", "regular", "--a_dim", "8", "--dataset", "mnist",
        "--epochs", "3", "--batch_size", "16", "--diffusion_steps", "6",
        "--save_epochs", "10", "--data_dir", "synthetic", *extra,
    ])


def test_fault_injected_preemption_then_resume(workdir, monkeypatch):
    root = "models/mnist_8d_0.1mmd_latent"
    # preempt after 2 steps: mid-epoch-0 -> model-0 with full state
    monkeypatch.setenv("INFODIFF_PREEMPT_AFTER_STEPS", "2")
    state = dispatch(_latent_cfg())
    assert os.path.isdir(f"{root}/model-0")
    assert not os.path.isdir(f"{root}/model-3")
    assert int(state.step) == 2

    # resume completes the remaining epochs from the saved state
    monkeypatch.delenv("INFODIFF_PREEMPT_AFTER_STEPS")
    state2 = dispatch(_latent_cfg(["--resume"]))
    # 2 preempted steps + 3 full epochs x 4 steps (epoch 0 re-run)
    assert int(state2.step) == 2 + 3 * 4


def test_resume_matches_uninterrupted_training(workdir):
    """Epoch-boundary resume is EXACT: restoring the epoch-1 checkpoint
    and training epochs 2-3 reproduces the uninterrupted 3-epoch run
    bit-for-bit. This pins all three resume alignments together — full
    optimizer state (Orbax), per-step noise keys folded from
    (seed, step), and the data stream (loader.fast_forward replays the
    shuffle/flip RNG the consumed epochs drew)."""
    import shutil

    import jax

    root = "models/mnist_8d_0.1mmd_latent"
    state_full = dispatch(_latent_cfg(["--save_epochs", "1"]))
    assert int(state_full.step) == 3 * 4

    # keep only the epoch-1 checkpoint, then resume to completion
    shutil.rmtree(f"{root}/model-2")
    shutil.rmtree(f"{root}/model-3")
    state_resumed = dispatch(_latent_cfg(["--save_epochs", "10",
                                          "--resume"]))
    assert int(state_resumed.step) == 3 * 4

    jax.tree.map(
        lambda want, got: np.testing.assert_array_equal(
            np.asarray(want), np.asarray(got)
        ),
        state_full.params, state_resumed.params,
    )
    jax.tree.map(
        lambda want, got: np.testing.assert_array_equal(
            np.asarray(want), np.asarray(got)
        ),
        state_full.opt_state, state_resumed.opt_state,
    )


def test_sigterm_sets_preempt_flag():
    runner._PREEMPTED.clear()
    prev = signal.signal(signal.SIGTERM, runner.request_preempt)
    try:
        os.kill(os.getpid(), signal.SIGTERM)
        # python delivers the signal on the next bytecode boundary
        assert runner._PREEMPTED.wait(timeout=5)
    finally:
        signal.signal(signal.SIGTERM, prev)
        runner._PREEMPTED.clear()


def test_async_ckpt_and_retention_via_cli(workdir):
    root = "models/mnist_8d_0.1mmd_latent"
    dispatch(_latent_cfg([
        "--save_epochs", "1", "--async_ckpt", "--keep_checkpoints", "1",
    ]))
    kept = sorted(d for d in os.listdir(root) if d.startswith("model-"))
    assert kept == ["model-3"]
