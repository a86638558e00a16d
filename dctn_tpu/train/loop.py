"""The training loop: an event loop around the jitted step.

Capability parity: reference ``dctn/training.py`` — infinite-epoch iteration,
at-iter-start / after-step hook lists, last-N and best-per-metric
checkpointers with metric-stamped filenames, multi-metric patience early
stopping, max-iters stopper, NaN-loss stopper that dumps model+batch state.

TPU-first design notes:
- The loop NEVER fetches device values in steady state (device→host is
  ~450 KB/s here; even a scalar costs a relay round trip). Step metrics stay
  on device; a NaN flag is accumulated INSIDE the jitted step and everything
  is fetched only at scheduled eval points. Between evals the host just
  dispatches steps, keeping the device pipeline full.
- Batches are index gathers from the device-resident split.
- Checkpoints are written by a background thread (AsyncWriter).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from collections import deque
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import AsyncWriter, save_pytree

logger = logging.getLogger(__name__)

Hook = Callable[["TrainLoopState"], None]


@dataclasses.dataclass
class TrainLoopState:
    """Mutable cross-iteration state (the analog of the reference's st_x +
    st_it dict pair, typed)."""

    params: Any
    opt_state: Any
    rng: jax.Array
    num_iters_done: int = 0
    stop: bool = False
    stop_reason: Optional[str] = None
    # per-iteration, populated by the loop / eval hook:
    iter_metrics: Dict[str, float] = dataclasses.field(default_factory=dict)
    batch_indices: Optional[np.ndarray] = None
    last_batch: Optional[Tuple[Any, Any]] = None  # (xb, yb) device arrays
    device_metrics: Any = None  # last step's metrics, still on device
    nan_flag: Any = None  # device bool accumulated across steps
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)


def train(
    state: TrainLoopState,
    step_fn: Callable,
    gather_fn: Callable,
    index_stream,
    at_iter_start: Sequence[Hook] = (),
    after_step: Sequence[Hook] = (),
) -> TrainLoopState:
    """Run until a hook sets ``state.stop``.

    ``step_fn(params, opt_state, rng, xb, yb) → (params, opt_state, metrics)``
    ``gather_fn(idx) → (xb, yb)``; ``index_stream`` yields per-iteration numpy
    index arrays (an infinite epoch-shuffled stream, training.py:14-16).
    """
    nan_accum = jnp.zeros((), jnp.bool_)
    for num_iters_done, idx in enumerate(index_stream, start=state.num_iters_done):
        state.num_iters_done = num_iters_done
        state.iter_metrics = {}
        state.batch_indices = idx
        for hook in at_iter_start:
            hook(state)
            if state.stop:
                break
        if state.stop:
            break
        state.rng, sub = jax.random.split(state.rng)
        xb, yb = gather_fn(jnp.asarray(idx))
        state.last_batch = (xb, yb)
        state.params, state.opt_state, metrics = step_fn(
            state.params, state.opt_state, sub, xb, yb
        )
        nan_accum = jnp.logical_or(nan_accum, ~jnp.isfinite(metrics["loss"]))
        state.device_metrics = metrics
        state.nan_flag = nan_accum
        for hook in after_step:
            hook(state)
            if state.stop:
                break
        if state.stop:
            break
    return state


# ---------------------------------------------------------------------------
# checkpointers (training.py:116-174)


def _metrics_filename(prefix: str, state: TrainLoopState) -> str:
    m = state.iter_metrics
    nitd = state.num_iters_done
    tracc = m.get("train_acc", float("nan"))
    vacc = m.get("val_acc", float("nan"))
    trmce = m.get("train_mean_ce", float("nan"))
    vmce = m.get("val_mean_ce", float("nan"))
    return (
        f"{prefix}_nitd={nitd:07}_tracc={tracc:.4f}_vacc={vacc:.4f}"
        f"_trmce={trmce:.4f}_vmce={vmce:.4f}.npz"
    )


class LastModelsCheckpointer:
    """Ring buffer of the N most recent model checkpoints
    (training.py:127-145)."""

    def __init__(
        self,
        dir: str,
        n: int,
        writer: Optional[AsyncWriter] = None,
        params_view: Optional[Callable] = None,
    ):
        assert n >= 1
        self.dir = dir
        self.n = n
        self.filenames: deque = deque()
        self.writer = writer or AsyncWriter()
        # optional device→checkpoint layout transform (e.g. merge_tp_params,
        # so TP runs still save reference-layout checkpoints)
        self.params_view = params_view

    def __call__(self, state: TrainLoopState) -> None:
        filename = _metrics_filename("model", state)
        payload = (
            self.params_view(state.params) if self.params_view else state.params
        )
        self.writer.submit(payload, os.path.join(self.dir, filename))
        self.filenames.appendleft(filename)
        while len(self.filenames) > self.n:
            old = self.filenames.pop()
            self.writer.wait()
            path = os.path.join(self.dir, old)
            if os.path.exists(path):
                os.remove(path)


class BestModelCheckpointer:
    """Keeps the single best checkpoint for one metric (training.py:148-174)."""

    def __init__(
        self,
        dir: str,
        key: str,
        low_is_good: bool,
        writer: Optional[AsyncWriter] = None,
        params_view: Optional[Callable] = None,
    ):
        self.dir = dir
        self.key = key
        self.low_is_good = low_is_good
        self.best_value = float("inf") if low_is_good else float("-inf")
        self.filename: Optional[str] = None
        self.writer = writer or AsyncWriter()
        self.params_view = params_view

    def __call__(self, state: TrainLoopState) -> None:
        if self.key not in state.iter_metrics:
            return
        value = state.iter_metrics[self.key]
        better = value < self.best_value if self.low_is_good else value > self.best_value
        if better:
            new_filename = _metrics_filename(f"model_best_{self.key}", state)
            payload = (
                self.params_view(state.params) if self.params_view else state.params
            )
            self.writer.submit(payload, os.path.join(self.dir, new_filename))
            self.best_value = value
            if self.filename is not None:
                self.writer.wait()
                old = os.path.join(self.dir, self.filename)
                if os.path.exists(old):
                    os.remove(old)
            self.filename = new_filename


# ---------------------------------------------------------------------------
# stoppers (training.py:177-237)


class ValuesNotImprovingEarlyStopper:
    """Stop when none of the tracked metrics improves for ``patience``
    consecutive calls."""

    def __init__(self, patience: int, keys: Sequence[Tuple[str, bool]]):
        self.keys = tuple(keys)
        self.best_values = [
            float("inf") if low_is_good else float("-inf") for _, low_is_good in keys
        ]
        self.num_bad_calls = 0
        self.patience = patience

    def __call__(self, state: TrainLoopState) -> None:
        improvement = False
        for i, (key, low_is_good) in enumerate(self.keys):
            if key not in state.iter_metrics:
                continue
            value = state.iter_metrics[key]
            best = self.best_values[i]
            if (low_is_good and value < best) or (not low_is_good and value > best):
                self.best_values[i] = value
                improvement = True
        if improvement:
            self.num_bad_calls = 0
        else:
            self.num_bad_calls += 1
        if self.num_bad_calls > self.patience:
            state.stop = True
            state.stop_reason = "early_stopping"
            logger.info("Early stopping at num_iters_done=%d", state.num_iters_done)


def make_stopper_after_n_iters(n: int) -> Hook:
    def maybe_stop(state: TrainLoopState) -> None:
        if state.num_iters_done >= n:
            state.stop = True
            state.stop_reason = "max_iters"

    return maybe_stop


def make_stopper_on_nan_loss(
    dir: str,
    forward_fn: Optional[Callable[[Any, Any], Any]] = None,
    params_view: Optional[Callable] = None,
    fetch: Callable = np.asarray,
    write_files: bool = True,
) -> Hook:
    """Checks the device-accumulated NaN flag (fetched only when this hook
    runs — put it on the eval schedule, unlike the reference's per-iteration
    check, to avoid a relay round trip per step). On trigger, dumps params,
    the last batch's indices AND contents, and — when ``forward_fn(params,
    xb) → output`` is given — the model output, to ``nan_loss_stop/``.

    Honest difference from training.py:213-237 (which checks every
    iteration and saves the TRIGGERING x/y/output): because the flag is
    device-accumulated and observed on the schedule, the dumped batch and
    output are from the OBSERVATION step, and the output is recomputed with
    post-update params. They bracket the failure (the NaN happened at or
    before this step since the previous observation); a README in the dump
    directory records this so nobody debugs the wrong batch. Tighten the
    eval schedule to localize further.

    Multi-controller model-sharded runs (runner --distributed ×
    --model-devices/--space-devices) pass ``fetch`` = the collective host
    gather (tensor_parallel._to_host) and ``write_files=is_primary``: every
    process runs the gathers/forward (collectives must execute everywhere),
    only process 0 touches disk."""

    def stop_on_nan(state: TrainLoopState) -> None:
        if state.nan_flag is None:
            return
        if bool(state.nan_flag):
            logger.warning("Stopping because of NaN or Inf loss")
            state.stop = True
            state.stop_reason = "nan_loss"
            subdir = os.path.join(dir, "nan_loss_stop")
            if write_files and os.path.exists(subdir):
                logger.error("%s already exists", subdir)
                return
            # gathers run on EVERY process (collectives), writes are gated
            params_host = (
                params_view(state.params) if params_view else state.params
            )
            params_host = jax.tree_util.tree_map(fetch, params_host)
            batch_host = out_host = None
            if state.last_batch is not None and state.last_batch[1] is not None:
                # (in the DP path gather yields (local_idx, None) — indices
                # are already saved above, the sharded batch is not fetched)
                xb, yb = state.last_batch
                batch_host = (fetch(xb), fetch(yb))
                if forward_fn is not None:
                    out_host = fetch(forward_fn(state.params, xb))
            if not write_files:
                return
            os.mkdir(subdir)
            with open(os.path.join(subdir, "README.txt"), "w") as f:
                f.write(
                    "NaN/Inf was detected by the device-accumulated flag at "
                    f"observation step {state.num_iters_done}. The saved "
                    "batch/output are from THIS step (post-update params), "
                    "not necessarily the iteration that produced the NaN — "
                    "that happened at or before this step, since the "
                    "previous scheduled observation.\n"
                )
            save_pytree(
                params_host,
                os.path.join(subdir, f"model_nitd={state.num_iters_done}.npz"),
            )
            if state.batch_indices is not None:
                np.save(os.path.join(subdir, "batch_indices.npy"), state.batch_indices)
            if batch_host is not None:
                np.savez(
                    os.path.join(subdir, "batch.npz"),
                    x=batch_host[0],
                    y=batch_host[1],
                )
                if out_host is not None:
                    np.save(os.path.join(subdir, "output.npy"), out_host)

    return stop_on_nan


def log_parameters_stats(state: TrainLoopState) -> None:
    """μ/σ/shape of every parameter (training.py:240-248)."""
    logger.info("After %07d iters:", state.num_iters_done)
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = np.asarray(leaf)
        logger.info(
            "%s: μ=%.7e, σ=%.7e, shape=%s", name, arr.mean(), arr.std(), arr.shape
        )
