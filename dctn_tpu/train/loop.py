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
        hist = state.extras.get("nan_replay_idx_history")
        if hist is not None:  # NaN-forensics replay enabled (NanLossStopper)
            hist.append(np.asarray(idx))
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
            # cleanup belongs to the process that writes: a discard writer
            # (non-primary controller) must not race the primary's
            # exists-then-remove on a shared output filesystem
            if getattr(self.writer, "discard", False):
                continue
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
            if self.filename is not None and not getattr(
                self.writer, "discard", False
            ):
                # discard writers (non-primary controllers) skip cleanup —
                # see LastModelsCheckpointer
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


def _device_copy(tree):
    """Fresh device buffers with the same shardings — a jitted identity
    WITHOUT donation cannot alias its inputs, so the result survives the
    train step donating the originals (the replay anchor's requirement)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    copied = jax.jit(lambda *xs: xs)(*leaves)
    return jax.tree_util.tree_unflatten(treedef, copied)


def make_stopper_on_nan_loss(
    dir: str,
    forward_fn: Optional[Callable[[Any, Any], Any]] = None,
    params_view: Optional[Callable] = None,
    fetch: Callable = np.asarray,
    write_files: bool = True,
    replay_step: Optional[Callable] = None,
    replay_gather: Optional[Callable] = None,
    interactive: bool = False,
) -> "NanLossStopper":
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

    With ``replay_step``/``replay_gather`` (the loop's own step/gather
    closures) the stopper upgrades to TRIGGERING-BATCH forensics (reference
    parity+, VERDICT r3 #7): at every clean observation it re-anchors a
    device COPY of (params, opt_state, rng) and clears the loop-maintained
    index history (``state.extras["nan_replay_idx_history"]``); on trigger
    it REPLAYS the recorded steps from the anchor with a per-step flag
    fetch, isolating the exact iteration whose loss went non-finite, and
    dumps THAT batch with the PRE-step params and output — the reference's
    per-iteration semantics (training.py:213-237) at the accumulated
    flag's steady-state cost. Call ``enable_replay(state)`` once before
    ``train()`` so the first anchor covers the steps before the first
    observation.

    Multi-controller model-sharded runs (runner --distributed ×
    --model-devices/--space-devices) pass ``fetch`` = the collective host
    gather (tensor_parallel._to_host) and ``write_files=is_primary``: every
    process runs the gathers/forward/replay (collectives must execute
    everywhere — the replay is the same deterministic jitted step on every
    controller), only process 0 touches disk."""
    return NanLossStopper(
        dir, forward_fn, params_view, fetch, write_files, replay_step,
        replay_gather, interactive,
    )


class NanLossStopper:
    """See ``make_stopper_on_nan_loss`` (kept as the public factory).

    ``interactive=True`` (the runner's ``--breakpoint-on-nan-loss``,
    reference parity: ``new_runner.py:170``) drops into the debugger via
    ``breakpoint()`` AFTER the forensics, with the dumped host values in
    scope (``params_host``, ``batch_host``, ``out_host``, ``iter_no``) —
    honor ``PYTHONBREAKPOINT`` like any breakpoint() call."""

    def __init__(
        self, dir, forward_fn, params_view, fetch, write_files,
        replay_step, replay_gather, interactive=False,
    ):
        self.dir = dir
        self.forward_fn = forward_fn
        self.params_view = params_view
        self.fetch = fetch
        self.write_files = write_files
        self.replay_step = replay_step
        self.replay_gather = replay_gather
        self.interactive = interactive
        self._anchor = None  # (params_copy, opt_state_copy, rng, iters_done)

    @property
    def replay_enabled(self):
        return self.replay_step is not None and self.replay_gather is not None

    def enable_replay(self, state: TrainLoopState) -> None:
        """Install the index history and the initial anchor (device copies
        of the CURRENT state — the train step donates its buffers, so the
        anchor must own fresh ones)."""
        assert self.replay_enabled
        state.extras["nan_replay_idx_history"] = []
        # before the loop: the next iteration to run IS num_iters_done
        self._reanchor(state, next_iter=state.num_iters_done)

    def _reanchor(self, state: TrainLoopState, next_iter=None) -> None:
        if next_iter is None:
            # called from after_step of iteration N → the anchor state is
            # the input of iteration N+1
            next_iter = state.num_iters_done + 1
        self._anchor = (
            _device_copy(state.params),
            _device_copy(state.opt_state),
            state.rng,  # rebound (not donated) each iteration — a ref is safe
            next_iter,
        )
        hist = state.extras.get("nan_replay_idx_history")
        if hist is not None:
            hist.clear()

    def _replay(self, state: TrainLoopState):
        """Step forward from the anchor, fetching the loss flag per step;
        returns (iter_no, idx, xb, yb, pre_step_params) of the triggering
        iteration, or None if the replay never reproduces the NaN."""
        params, opt_state, rng, it0 = self._anchor
        history = list(state.extras.get("nan_replay_idx_history") or ())
        for i, idx in enumerate(history):
            rng, sub = jax.random.split(rng)
            xb, yb = self.replay_gather(jnp.asarray(idx))
            prev_params = _device_copy(params)
            params, opt_state, metrics = self.replay_step(
                params, opt_state, sub, xb, yb
            )
            if not np.isfinite(float(metrics["loss"])):
                return it0 + i, idx, xb, yb, prev_params
        return None

    def __call__(self, state: TrainLoopState) -> None:
        if state.nan_flag is None:
            return
        if not bool(state.nan_flag):
            if self.replay_enabled and self._anchor is not None:
                self._reanchor(state)
            return
        logger.warning("Stopping because of NaN or Inf loss")
        state.stop = True
        state.stop_reason = "nan_loss"
        fetch, write_files = self.fetch, self.write_files
        subdir = os.path.join(self.dir, "nan_loss_stop")
        # A pre-existing dump dir must NOT early-return here: in
        # multi-controller runs only the primary has write_files=True, so a
        # primary-only return would strand the other controllers in the
        # replay/host-gather collectives below (a distributed hang in the
        # error path). Every process runs the full forensics identically;
        # only the write phase is skipped.
        subdir_exists = os.path.exists(subdir)
        if write_files and subdir_exists:
            logger.error(
                "%s already exists; skipping the dump (forensics still run)",
                subdir,
            )

        triggering = (
            self._replay(state)
            if self.replay_enabled and self._anchor is not None
            else None
        )
        if triggering is not None:
            iter_no, idx, xb, yb, pre_params = triggering
            logger.warning(
                "NaN replay isolated the triggering iteration: %d", iter_no
            )
            readme = (
                f"NaN/Inf flag observed at step {state.num_iters_done}; "
                "replaying from the last clean observation isolated the "
                f"TRIGGERING iteration: {iter_no}. The saved batch/output "
                "and params are from THAT iteration (params as they were "
                "BEFORE its update — the reference's per-iteration dump "
                "semantics, training.py:213-237).\n"
            )
            dump_params, dump_iter = pre_params, iter_no
        else:
            if self.replay_enabled and self._anchor is not None:
                logger.warning(
                    "NaN replay did not reproduce the non-finite loss; "
                    "dumping the observation-step state instead"
                )
            iter_no, idx, xb, yb = (
                state.num_iters_done,
                state.batch_indices,
                *(state.last_batch or (None, None)),
            )
            readme = (
                "NaN/Inf was detected by the device-accumulated flag at "
                f"observation step {state.num_iters_done}. The saved "
                "batch/output are from THIS step (post-update params), "
                "not necessarily the iteration that produced the NaN — "
                "that happened at or before this step, since the "
                "previous scheduled observation.\n"
            )
            dump_params, dump_iter = state.params, state.num_iters_done

        # gathers run on EVERY process (collectives), writes are gated
        params_host = (
            self.params_view(dump_params) if self.params_view else dump_params
        )
        params_host = jax.tree_util.tree_map(fetch, params_host)
        batch_host = out_host = None
        if xb is not None and yb is not None:
            # (in the DP path gather yields (local_idx, None) — indices
            # are saved below, the sharded batch is not fetched)
            batch_host = (fetch(xb), fetch(yb))
            if self.forward_fn is not None:
                out_host = fetch(self.forward_fn(dump_params, xb))
        if self.interactive and write_files:
            # --breakpoint-on-nan-loss (new_runner.py:170 parity): inspect
            # params_host / batch_host / out_host / iter_no interactively
            breakpoint()  # noqa: T100
        if not write_files or subdir_exists:
            return
        os.mkdir(subdir)
        with open(os.path.join(subdir, "README.txt"), "w") as f:
            f.write(readme)
        save_pytree(
            params_host,
            os.path.join(subdir, f"model_nitd={dump_iter}.npz"),
        )
        if idx is not None:
            np.save(os.path.join(subdir, "batch_indices.npy"), np.asarray(idx))
        if batch_host is not None:
            np.savez(
                os.path.join(subdir, "batch.npz"),
                x=batch_host[0],
                y=batch_host[1],
            )
            if out_host is not None:
                np.save(os.path.join(subdir, "output.npy"), out_host)


def log_parameters_stats(state: TrainLoopState) -> None:
    """μ/σ/shape of every parameter (training.py:240-248)."""
    logger.info("After %07d iters:", state.num_iters_done)
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = np.asarray(leaf)
        logger.info(
            "%s: μ=%.7e, σ=%.7e, shape=%s", name, arr.mean(), arr.std(), arr.shape
        )
