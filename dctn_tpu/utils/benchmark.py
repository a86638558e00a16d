"""Micro-benchmark harness for jitted functions (reference ``dctn/benchmark.py``).

Measures forward and forward+backward seconds/iteration with correct device
synchronization. On the tunneled axon TPU backend ``block_until_ready`` may
return before execution finishes, so the fence is a SCALAR VALUE FETCH of a
reduction of the output (the documented reliable sync in this environment).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp


def _fence(value) -> float:
    leaf = jax.tree_util.tree_leaves(value)[0]
    return float(jnp.sum(leaf))


_MIN_WINDOW_S = 1.0  # every fenced window costs a fixed ~28 ms through the
# axon relay (docs/performance.md measurement rules): windows shorter than
# ~1 s of device time inflate per-iteration readings materially, so the
# harness auto-extends the window until it is long enough.


def _timed_window(call: Callable[[], Any], num_iterations: int):
    """(seconds/iteration, iterations used): time a fenced window of
    ``num_iterations`` calls, auto-extending the window to ≥ _MIN_WINDOW_S
    so the fixed per-window dispatch+fence cost stays under ~3%."""
    t0 = time.perf_counter()
    for _ in range(num_iterations):
        out = call()
    _fence(out)
    dt = time.perf_counter() - t0
    if dt < _MIN_WINDOW_S:
        num_iterations = max(
            num_iterations, int(num_iterations * 1.2 * _MIN_WINDOW_S / max(dt, 1e-9))
        )
        t0 = time.perf_counter()
        for _ in range(num_iterations):
            out = call()
        _fence(out)
        dt = time.perf_counter() - t0
    return dt / num_iterations, num_iterations


def benchmark_jax(
    fn: Callable,
    args: Sequence[Any],
    *,
    with_backward: bool = True,
    num_iterations: int = 10,
    warmup: int = 2,
    grad_argnums=0,
) -> Dict[str, Any]:
    """Returns the reference's result-dict shape: forward s/iter and (if
    requested) forward+backward s/iter for ``fn(*args)``.
    ``num_iterations`` is a floor — the timed window auto-extends to
    ≥ ~1 s of device time (see ``_timed_window``)."""
    fwd = jax.jit(fn)
    result: Dict[str, Any] = {}

    for _ in range(warmup):
        out = fwd(*args)
    _fence(out)
    s_per_iter, iters = _timed_window(lambda: fwd(*args), num_iterations)
    result["num_iterations"] = iters
    result["forward_seconds_per_iteration"] = s_per_iter

    if with_backward:
        def scalar_loss(*a):
            return jnp.sum(fn(*a) ** 2)

        fwd_bwd = jax.jit(jax.grad(scalar_loss, argnums=grad_argnums))
        for _ in range(warmup):
            g = fwd_bwd(*args)
        _fence(g)
        s_per_iter, iters = _timed_window(lambda: fwd_bwd(*args), num_iterations)
        result["num_iterations_backward"] = iters
        result["forward_backward_seconds_per_iteration"] = s_per_iter
    return result
