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
