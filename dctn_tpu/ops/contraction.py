"""Shape-specialized tensor-network contraction planner.

The TPU analog of the reference's process-wide einsum-plan memoizer
(``dctn/contraction_path_cache.py``): contraction *paths* are searched once per
unique (dim-names, shapes) signature with opt_einsum at Python trace time, then
executed as a single jnp.einsum with the precomputed path, which XLA lowers to
a chain of MXU dot_generals. Under jit, tracing already happens once per shape
signature, so the cache's job is to avoid re-running the (potentially
expensive, ``auto-hq``) path search on every retrace.

API matches the reference's interleaved named-dims form
(contraction_path_cache.py:34):

    contract(t1, ("a", "b"), t2, ("b", "c"), ("a", "c"))
"""

from __future__ import annotations

from typing import Any, Dict, Hashable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import opt_einsum as oe

_PLAN_CACHE: Dict[Hashable, Any] = {}
_HITS = 0
_MISSES = 0


def _to_letters(all_dim_names: Sequence[Tuple[str, ...]]) -> Tuple[str, ...]:
    """Map arbitrary hashable dim names to single-letter einsum symbols."""
    mapping: Dict[str, str] = {}
    letters = []
    for names in all_dim_names:
        s = []
        for name in names:
            if name not in mapping:
                mapping[name] = oe.get_symbol(len(mapping))
            s.append(mapping[name])
        letters.append("".join(s))
    return tuple(letters)


def _parse_interleaved(args):
    """Split ``t1, names1, t2, names2, ..., out_names`` into parts."""
    if len(args) % 2 != 1:
        raise ValueError(
            "expected interleaved (tensor, dim_names) pairs followed by output dim names"
        )
    tensors = list(args[0:-1:2])
    names = [tuple(n) for n in args[1:-1:2]]
    out_names = tuple(args[-1])
    if len(tensors) != len(names):
        raise ValueError("mismatched tensors and dim-name tuples")
    for t, n in zip(tensors, names):
        if t.ndim != len(n):
            raise ValueError(f"tensor with ndim={t.ndim} got {len(n)} dim names {n}")
    return tensors, names, out_names


def contract(*args, optimize: str = "auto-hq"):
    """Contract a tensor network given as interleaved (tensor, dim names) pairs
    followed by the output dim names. The contraction path is memoized by the
    (names, shapes) signature and re-used across calls and retraces."""
    global _HITS, _MISSES
    tensors, names, out_names = _parse_interleaved(args)
    letter_inputs = _to_letters(list(names) + [out_names])
    expr = ",".join(letter_inputs[:-1]) + "->" + letter_inputs[-1]
    shapes = tuple(tuple(int(d) for d in t.shape) for t in tensors)
    key = (expr, shapes, optimize)
    path = _PLAN_CACHE.get(key)
    if path is None:
        _MISSES += 1
        path, _ = oe.contract_path(
            expr, *[np.empty(s, dtype=np.int8) for s in shapes], optimize=optimize,
            shapes=False,
        )
        _PLAN_CACHE[key] = path
    else:
        _HITS += 1
    return jnp.einsum(expr, *tensors, optimize=path)


def plan_info() -> Dict[str, int]:
    return {"cached_plans": len(_PLAN_CACHE), "hits": _HITS, "misses": _MISSES}


def clear_plan_cache() -> None:
    global _HITS, _MISSES
    _PLAN_CACHE.clear()
    _HITS = 0
    _MISSES = 0
