"""Preemption-safe training: graceful SIGTERM checkpoint-and-stop.

No reference analog — ``dctn/training.py`` has no failure recovery at all
(SURVEY §5: "Failure detection / elastic recovery: None"; the reference's
only restore path is a manual ``--load-model-state`` of model weights,
``new_runner.py:130,432-433``, which loses the optimizer). On TPU fleets
preemption is routine — maintenance events and spot reclamation deliver
SIGTERM with a grace window — so the framework turns the signal into a
clean stop: finish the in-flight step, write the FULL train state (params +
optimizer moments + step + rng chain) through the async checkpoint writer,
and exit the loop with a ``preempted`` stop reason. ``--resume-from
<dir>/train_state_latest.npz`` then continues the trajectory EXACTLY: the
runner restores the step rng chain and optimizer state and fast-forwards
the epoch-shuffled batch stream to the saved step, so a preempted-and-
resumed run is bit-identical to an uninterrupted one
(tests/test_preemption.py).
"""

from __future__ import annotations

import logging
import signal
from typing import Callable, Sequence

logger = logging.getLogger(__name__)


class PreemptionHandler:
    """Context manager installing signal handlers that request a graceful
    stop. The handler itself only sets a flag (async-signal-safe); the
    actual checkpoint happens on the training thread via :meth:`make_hook`,
    after the in-flight step completes."""

    def __init__(self, signals: Sequence[int] = (signal.SIGTERM,)):
        self.signals = tuple(signals)
        self.fired: str | None = None
        self._prev: dict = {}
        self.installed = False

    def __enter__(self) -> "PreemptionHandler":
        try:
            for s in self.signals:
                self._prev[s] = signal.signal(s, self._on_signal)
            self.installed = True
        except ValueError:
            # signal.signal only works on the main thread; programmatic
            # callers (e.g. tests driving run() from a worker thread) just
            # lose preemption safety, not training
            logger.warning(
                "not on the main thread — preemption handler disabled"
            )
        return self

    def __exit__(self, *exc) -> bool:
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        self.installed = False
        return False

    def _on_signal(self, signum, frame) -> None:
        self.fired = signal.Signals(signum).name
        logger.warning(
            "received %s: checkpointing train state and stopping after the "
            "current step",
            self.fired,
        )

    def make_hook(self, save_fn: Callable) -> Callable:
        """A loop hook: when a signal has fired, save the full train state
        and stop. ``save_fn(state)`` must write the same train_state payload
        the scheduled saver does (the runner passes it with the right
        completed-step offset for its hook position)."""

        def hook(state) -> None:
            if self.fired is not None and not state.stop:
                save_fn(state)
                state.stop = True
                state.stop_reason = (
                    f"preempted ({self.fired}); train state saved for "
                    "--resume-from"
                )

        return hook

    def make_synced_hook(self, save_fn: Callable, sync_every: int) -> Callable:
        """Multi-controller variant (at-iter-start only): local signals do
        NOT stop the loop directly — every ``sync_every`` iterations all
        processes agree on whether ANY of them was signaled, and if so they
        all stop at that SAME iteration. An immediate per-process stop would
        strand the other controllers in the next step's collectives (their
        psum participants include this process's devices); deferring to a
        shared boundary keeps every dispatched step complete and the saved
        state identical on all ranks. Worst case adds ``sync_every`` steps
        between the signal and the stop — pick it so that fits the
        preemption grace window (the runner default, 16, is ~70 ms at the
        flagship step time vs a ~30 s TPU maintenance grace)."""
        assert sync_every >= 1
        import numpy as np
        from jax.experimental import multihost_utils

        def hook(state) -> None:
            if state.stop or state.num_iters_done % sync_every:
                return
            fired = np.array([0 if self.fired is None else 1], np.int32)
            total = int(multihost_utils.process_allgather(fired).sum())
            if total:
                save_fn(state)
                state.stop = True
                state.stop_reason = (
                    f"preempted (signal on {total} process(es); all "
                    "controllers stopped at the same step); train state "
                    "saved for --resume-from"
                )

        return hook
