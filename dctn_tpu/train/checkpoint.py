"""Pytree checkpoint serialization: flattened key-path → .npz files.

The reference saves torch ``state_dict``s (dctn/training.py:120-121); here any
params/opt-state pytree round-trips through a flat npz keyed by tree paths.
Loading restores into a template pytree (same structure), so optimizer states
and model params both work. No orbax dependency: files are plain npz, easy to
inspect, and small (device→host is slow in this environment, so checkpoints
are fetched once per save and written in a background thread by the loop).
"""

from __future__ import annotations

import io
import os
import threading
from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(tree: Any, filename: str) -> None:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_str(path): np.asarray(leaf) for path, leaf in flat}
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, filename)


def load_pytree(template: Any, filename: str) -> Any:
    """Restore a pytree with the structure (and dtypes) of ``template``."""
    with np.load(filename) as data:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for path, leaf in flat:
            key = _path_str(path)
            if key not in data:
                raise KeyError(f"checkpoint {filename} missing leaf {key}")
            arr = data[key]
            expected = np.shape(leaf)
            if tuple(arr.shape) != tuple(expected):
                raise ValueError(
                    f"checkpoint leaf {key}: shape {arr.shape} != template {expected}"
                )
            leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype if hasattr(leaf, "dtype") else None))
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), leaves
        )


class AsyncWriter:
    """Serializes checkpoint writes on a background thread so the training
    loop never blocks on the slow device→host path + disk.

    ``discard=True`` turns every submit into a no-op — multi-controller
    runs construct non-primary writers this way so checkpoint HOOKS (whose
    host gathers are collectives under model-sharded meshes) still run on
    every process while only process 0 writes (cli/runner.py)."""

    def __init__(self, discard: bool = False):
        self._lock = threading.Lock()
        self._pending: list[threading.Thread] = []
        self.discard = discard

    def submit(self, tree: Any, filename: str) -> None:
        if self.discard:
            return
        # fetch to host synchronously (arrays may be donated/mutated next step)
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        host = {_path_str(p): np.asarray(l) for p, l in flat}

        def write():
            tmp = filename + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, **host)
            os.replace(tmp, filename)

        t = threading.Thread(target=write, daemon=True)
        t.start()
        with self._lock:
            self._pending = [x for x in self._pending if x.is_alive()] + [t]

    def wait(self) -> None:
        with self._lock:
            pending = list(self._pending)
        for t in pending:
            t.join()
