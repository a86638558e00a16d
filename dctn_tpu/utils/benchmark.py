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
    requested) forward+backward s/iter for ``fn(*args)``."""
    fwd = jax.jit(fn)
    result: Dict[str, Any] = {"num_iterations": num_iterations}

    for _ in range(warmup):
        out = fwd(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(num_iterations):
        out = fwd(*args)
    _fence(out)
    result["forward_seconds_per_iteration"] = (
        time.perf_counter() - t0
    ) / num_iterations

    if with_backward:
        def scalar_loss(*a):
            return jnp.sum(fn(*a) ** 2)

        fwd_bwd = jax.jit(jax.grad(scalar_loss, argnums=grad_argnums))
        for _ in range(warmup):
            g = fwd_bwd(*args)
        _fence(g)
        t0 = time.perf_counter()
        for _ in range(num_iterations):
            g = fwd_bwd(*args)
        _fence(g)
        result["forward_backward_seconds_per_iteration"] = (
            time.perf_counter() - t0
        ) / num_iterations
    return result
