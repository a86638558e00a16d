"""Performance-fallback registry: no silent 5× cliffs.

Several hot paths gate on static feasibility and quietly take a slower
route when the gate fails — the fused Pallas EPS forward drops to XLA when
a core's plan overflows VMEM (``ops/eps.py``), ConvSBS drops to XLA when a
spec is outside kernel scope or non-f32 (``ops/sbs.py``), and the split
autotuner skips candidates that fail to compile (``train/autotune.py``).
The reference always logs its decisions (conv_sbs.py:60,108); this module
gives every such gate one shared discipline (VERDICT r3 #6):

- ``record(reason)`` logs ONE warning per distinct reason per process (the
  gates run at trace time, so a jitted train step hits them once per
  compile, not per step) and remembers it;
- runners register a sink that appends each event to the run's
  ``run_info.txt`` so the provenance record shows which fast paths the run
  did NOT take.
"""

from __future__ import annotations

import logging
import threading
from typing import Callable, List, Tuple

logger = logging.getLogger(__name__)

_lock = threading.Lock()
_events: List[str] = []
_sinks: List[Callable[[str], None]] = []


def record(reason: str) -> None:
    """Log + remember a performance fallback (deduplicated per reason)."""
    with _lock:
        if reason in _events:
            return
        _events.append(reason)
        sinks = list(_sinks)
    logger.warning("performance fallback: %s", reason)
    for sink in sinks:
        try:
            sink(reason)
        except Exception:  # a sink failure must never break the hot path
            logger.exception("fallback sink failed")


def events() -> Tuple[str, ...]:
    """All distinct fallback reasons recorded so far (test/inspection)."""
    with _lock:
        return tuple(_events)


def add_sink(sink: Callable[[str], None]) -> None:
    """Register a callback invoked once per NEW distinct reason."""
    with _lock:
        _sinks.append(sink)


def file_sink(path: str) -> Callable[[str], None]:
    """A sink appending ``performance_fallback: <reason>`` lines to ``path``
    (the runners' run_info.txt), opening/closing the file per event so the
    line is flushed immediately."""

    def sink(reason: str) -> None:
        with open(path, "a") as f:
            f.write(f"performance_fallback: {reason}\n")

    return sink


def reset() -> None:
    """Clear events and sinks (tests; runners call it at startup so one
    process running several jobs attributes events to the right run)."""
    with _lock:
        _events.clear()
        _sinks.clear()
