"""Preemption-safe training + exact resume for the legacy ConvSBS runner.

Parity with the new runner's recovery story (train/preemption.py): the
reference's ``mnist.py`` can only hand-reload best WEIGHTS — it loses the
optimizer state, the warmup-LR position, and the early-stopping bookkeeping.
Here ``--resume-from train_state_latest.npz`` restores all of it and
fast-forwards the epoch-shuffle rng, so a stopped-and-resumed run is
bit-identical to an uninterrupted one — at epoch granularity (the per-epoch
safety save) AND mid-epoch (the SIGTERM save after the in-flight step).
"""

import os
import signal
import threading

import jax
import numpy as np

from dctn_tpu.cli.legacy_runner import run

COMMON = dict(
    ds_path="synthetic",
    num_sbs_layers=2,
    bond_dim_size=2,
    initialization="khrulkov-normal",
    learning_rate=3e-3,
    optimizer_type="rmsprop",
    batch_size=32,
    warmup_num_epochs=1,
    warmup_initial_multiplier=1e-2,
    synthetic_sizes=(128, 64),
    seed=0,
    tb_log_every_n_epochs=0,
)


def _assert_trees_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_epoch_resume_trajectory_bitwise(tmp_path):
    """Stop after 3 epochs, resume to 6: final TT cores are BIT-IDENTICAL to
    an uninterrupted 6-epoch run (optimizer + warmup position restored, rng
    chain fast-forwarded)."""
    pa, _ = run(models_dir=str(tmp_path / "a"), epochs=6, **COMMON)
    run(models_dir=str(tmp_path / "b"), epochs=3, **COMMON)
    sf = os.path.join(str(tmp_path / "b"), "train_state_latest.npz")
    with np.load(sf) as d:
        assert int(d["epoch"]) == 3 and int(d["step_in_epoch"]) == 0
    pc, _ = run(models_dir=str(tmp_path / "c"), epochs=6, resume_from=sf,
                **COMMON)
    _assert_trees_equal(pa, pc)


def test_midepoch_sigterm_resume_bitwise(tmp_path):
    """SIGTERM mid-epoch saves at (epoch, step) after the in-flight step;
    resuming continues the trajectory bit-exactly to the same final params
    as an uninterrupted run."""
    prev = signal.signal(signal.SIGTERM, lambda *a: None)
    try:
        pa, _ = run(models_dir=str(tmp_path / "a"), epochs=4, **COMMON)

        stop_killing = threading.Event()

        def killer():
            while not stop_killing.wait(0.5):
                os.kill(os.getpid(), signal.SIGTERM)

        t = threading.Thread(target=killer, daemon=True)
        t.start()
        run(models_dir=str(tmp_path / "b"), epochs=4, **COMMON)
        stop_killing.set()
        t.join(5)
        sf = os.path.join(str(tmp_path / "b"), "train_state_latest.npz")
        assert os.path.exists(sf)
        log = open(os.path.join(str(tmp_path / "b"), "log.log")).read()
        if "preempted (SIGTERM)" not in log:
            # the 4 epochs can outrun the first kill on a fast machine —
            # the epoch-granularity path is then what got exercised
            return
        pc, _ = run(models_dir=str(tmp_path / "c"), epochs=4, resume_from=sf,
                    **COMMON)
        _assert_trees_equal(pa, pc)
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_dp_resume_trajectory_bitwise(tmp_path):
    """Resume works under --mesh-devices: the replicated-core DP step saves
    and restores through the same state file, bit-exactly."""
    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs the virtual multi-device mesh")
    kw = dict(COMMON, mesh_devices=2)
    pa, _ = run(models_dir=str(tmp_path / "a"), epochs=4, **kw)
    run(models_dir=str(tmp_path / "b"), epochs=2, **kw)
    sf = os.path.join(str(tmp_path / "b"), "train_state_latest.npz")
    pc, _ = run(models_dir=str(tmp_path / "c"), epochs=4, resume_from=sf,
                **kw)
    _assert_trees_equal(pa, pc)


def test_no_preempt_save_opts_out(tmp_path):
    """--no-preempt-save leaves signal dispositions untouched."""
    sentinel = lambda *a: None  # noqa: E731
    prev = signal.signal(signal.SIGTERM, sentinel)
    try:
        run(models_dir=str(tmp_path), epochs=1, preempt_save=False, **COMMON)
        assert signal.getsignal(signal.SIGTERM) == sentinel
    finally:
        signal.signal(signal.SIGTERM, prev)
