"""Profiling helpers (SURVEY §5: the TPU equivalent of the reference's
timeit/CUDA-sync micro-benchmarks is jax.profiler tracing + the throughput
harness in utils/benchmark.py).

``trace(dir)`` wraps jax.profiler.trace and degrades to a no-op if the
backend can't produce device traces (the tunneled axon platform may not).
"""

from __future__ import annotations

import contextlib
import logging

logger = logging.getLogger(__name__)


class StepTracer:
    """Train-loop hook bracketing iterations [start, start+count) with a
    jax.profiler trace (TensorBoard/XProf format). Append to the loop's
    ``at_iter_start`` hooks and call :meth:`close` after training (training
    may stop before the window ends). Degrades to a no-op if the backend
    can't trace (the tunneled axon platform may not)."""

    def __init__(self, log_dir: str, start: int, count: int):
        assert count >= 1
        self.log_dir = log_dir
        self.start = start
        self.stop_at = start + count
        self.active = False
        self.done = False

    def __call__(self, state) -> None:
        it = state.num_iters_done
        if not self.done and not self.active and it >= self.start:
            import jax

            try:
                jax.profiler.start_trace(self.log_dir)
                self.active = True
                logger.info("profiler trace started at iter %d", it)
            except Exception as e:  # backend without trace support
                logger.warning("profiler trace unavailable: %s", e)
                self.done = True
        elif self.active and it >= self.stop_at:
            self.close()

    def close(self) -> None:
        if self.active:
            import jax

            try:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", self.log_dir)
            except Exception as e:
                logger.warning("profiler stop failed: %s", e)
            self.active = False
        self.done = True


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:
        logger.warning("profiler trace unavailable: %s", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", log_dir)
            except Exception as e:
                logger.warning("profiler stop failed: %s", e)
