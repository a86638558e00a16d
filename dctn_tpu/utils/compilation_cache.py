"""Persistent XLA compilation cache setup.

First compiles through the remote-compile tunnel cost tens of seconds for the
big fused train step; the on-disk cache makes every later process start hot.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(directory: str | None = None) -> None:
    """OPT-IN only (set DCTN_TPU_JAX_CACHE): on the axon remote-compile
    backend the persistent cache DEADLOCKS the first executable launch
    (observed: bench hung >25 min with an empty cache dir), so it must never
    be enabled by default in this environment."""
    import jax

    directory = directory or os.environ.get("DCTN_TPU_JAX_CACHE")
    if not directory:
        return
    try:
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization only
