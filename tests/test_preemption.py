"""Preemption-safe training + exact resume.

The reference has NO failure recovery (SURVEY §5: ``dctn/training.py``
keeps checkpointed weights only; ``new_runner.py:130,432-433`` restores
model weights manually and loses the optimizer). dctn-tpu turns SIGTERM —
the TPU-fleet preemption/maintenance signal — into a graceful
checkpoint-and-stop (``train/preemption.py``), and makes ``--resume-from``
trajectory-EXACT by restoring the rng chain + optimizer state and
fast-forwarding the epoch-shuffled batch stream to the saved step.
"""

import os
import signal
import threading
import time

import jax
import numpy as np

from dctn_tpu.cli.runner import run
from dctn_tpu.train.loop import TrainLoopState
from dctn_tpu.train.preemption import PreemptionHandler

COMMON = dict(
    ds_type="mnist",
    ds_path="synthetic",
    epses_specs=((2, 4),),
    batch_size=32,
    optimizer_name="adam",
    lr=3e-3,
    init_epses_composition_unit_theoretical_output_std=True,
    eval_schedule=((None, 10),),
    keep_last_models=1,
    synthetic_sizes=(128, 64, 64),
    patience=50,
)


def _out_dir(root: str) -> str:
    (sub,) = os.listdir(root)
    return os.path.join(root, sub)


def test_handler_hook_saves_once_and_stops():
    """Unit: the hook is inert until a signal fires, then saves exactly once
    and stops the loop with a ``preempted`` reason."""
    h = PreemptionHandler()
    saves = []
    hook = h.make_hook(lambda st: saves.append(st.num_iters_done))
    st = TrainLoopState(params=None, opt_state=None, rng=None,
                        num_iters_done=7)
    hook(st)
    assert not st.stop and saves == []
    h._on_signal(signal.SIGTERM, None)
    hook(st)
    assert st.stop
    assert "preempted (SIGTERM)" in st.stop_reason
    assert saves == [7]
    hook(st)  # stop already set: no double save
    assert saves == [7]


def test_handler_installs_and_restores():
    """The context manager installs on the main thread and restores the
    previous disposition on exit."""
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionHandler() as h:
        assert h.installed
        assert signal.getsignal(signal.SIGTERM) == h._on_signal
        os.kill(os.getpid(), signal.SIGTERM)
        deadline = time.monotonic() + 5
        while h.fired is None and time.monotonic() < deadline:
            time.sleep(0.01)
        assert h.fired == "SIGTERM"
    assert signal.getsignal(signal.SIGTERM) == prev


def test_exact_resume_trajectory_bitwise(tmp_path):
    """An interrupted-at-20 + resumed-to-40 run ends with BIT-IDENTICAL
    params to an uninterrupted 40-iteration run: rng chain and optimizer
    state are restored and the batch stream is fast-forwarded, so the
    resumed run consumes exactly the batches the original would have."""
    a = run(experiments_dir=str(tmp_path / "a"), max_num_iters=40, **COMMON)
    run(experiments_dir=str(tmp_path / "b"), max_num_iters=20, **COMMON)
    state_file = os.path.join(_out_dir(str(tmp_path / "b")),
                              "train_state_latest.npz")
    with np.load(state_file) as d:
        assert int(d["step"]) == 20
    c = run(experiments_dir=str(tmp_path / "c"), max_num_iters=40,
            resume_from=state_file, **COMMON)
    assert c.num_iters_done == 40
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(c.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """End to end: SIGTERM mid-training stops the loop with the train state
    saved; --resume-from continues to completion."""
    # a benign outer SIGTERM handler: the runner restores it on exit, so a
    # late kill from the timer thread cannot take down the test process
    prev = signal.signal(signal.SIGTERM, lambda *a: None)
    try:
        stop_killing = threading.Event()

        def killer():
            while not stop_killing.wait(1.0):
                os.kill(os.getpid(), signal.SIGTERM)

        t = threading.Thread(target=killer, daemon=True)
        t.start()
        state = run(experiments_dir=str(tmp_path / "a"),
                    max_num_iters=100000, **COMMON)
        stop_killing.set()
        t.join(5)
        assert state.stop_reason.startswith("preempted (SIGTERM)")
        sf = os.path.join(_out_dir(str(tmp_path / "a")),
                          "train_state_latest.npz")
        assert os.path.exists(sf)
        with np.load(sf) as d:
            saved = int(d["step"])
        assert saved <= state.num_iters_done + 1
        # stoppers fire on the eval schedule (every 10 iters here), so the
        # resumed run stops at the next schedule point >= the target
        st2 = run(experiments_dir=str(tmp_path / "b"),
                  max_num_iters=saved + 3, resume_from=sf, **COMMON)
        assert st2.num_iters_done >= saved + 3
        assert "max_iters" in st2.stop_reason
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_no_preempt_save_opts_out(tmp_path):
    """--no-preempt-save leaves signal dispositions untouched."""
    sentinel = lambda *a: None  # noqa: E731
    prev = signal.signal(signal.SIGTERM, sentinel)
    try:
        run(experiments_dir=str(tmp_path), max_num_iters=2,
            preempt_save=False, **COMMON)
        assert signal.getsignal(signal.SIGTERM) == sentinel
    finally:
        signal.signal(signal.SIGTERM, prev)
