"""Evaluation: mean cross-entropy and accuracy over a whole split.

Parity: reference ``dctn/evaluation.py:7-22`` (sum-reduction CE / sample
count, so ragged final batches are weighted correctly).

TPU-first design: the split lives in device HBM; scoring is ONE jitted
lax.scan over padded fixed-size batches with a validity mask — no per-batch
host round trips, no retracing across calls, and only two scalars ever leave
the device (critical here: device→host bandwidth through the relay is
~450 KB/s).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..models.eps_plus_linear import EPSesPlusLinearConfig, eps_plus_linear_forward


def padded_batch_ids(n_local: int, batch_size: int):
    """Clamped sample ids + in-range mask for scanning ``n_local`` samples
    in fixed ``batch_size`` batches: both (num_batches, batch_size)."""
    num_batches = -(-n_local // batch_size)
    ids = jnp.arange(num_batches * batch_size)
    in_range = (ids < n_local).reshape(num_batches, batch_size)
    clamped = jnp.minimum(ids, n_local - 1).reshape(num_batches, batch_size)
    return clamped, in_range


def masked_ce_acc_scan(forward_fn, x, y, ids, valid, sample_axis: int = 1):
    """Σ masked CE (sum reduction) and correct count over padded fixed-size
    batches, as ONE lax.scan — the shared core of every score fn (single
    device, DP per-device shard, TP per-shard). ``forward_fn(xb) → logits``;
    ``ids``/``valid``: (num_batches, batch_size). ``sample_axis``: which dim
    of ``x`` indexes samples (1 for (C, N, H, W, Q) quantum splits, 0 for
    the legacy family's (N, H, W) pixel splits)."""

    def body(carry, inp):
        ce_sum, correct = carry
        idx, mask = inp
        xb = jnp.take(x, idx, axis=sample_axis)
        yb = jnp.take(y, idx, axis=0)
        logits = forward_fn(xb)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
        pred = jnp.argmax(logits, axis=1)
        ce_sum = ce_sum + jnp.sum(ce * mask).astype(jnp.float32)
        correct = correct + jnp.sum((pred == yb) & mask).astype(jnp.int32)
        return (ce_sum, correct), None

    (ce_sum, correct), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (ids, valid)
    )
    return ce_sum, correct


def make_score_fn(
    cfg: EPSesPlusLinearConfig, batch_size: int, forward_fn=None
) -> Callable[[dict, jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Returns score(params, x, y) → (mean_ce, accuracy) computed on device.

    ``x``: (C, N, H, W, Q), ``y``: (N,). Jitted once per split size.
    ``forward_fn(params, xb) → logits`` overrides the model forward (e.g.
    the fast-cmt-layout pipeline)."""
    if forward_fn is None:
        forward_fn = lambda p, xb: eps_plus_linear_forward(  # noqa: E731
            p, xb, cfg, training=False
        )

    @jax.jit
    def score(params, x, y):
        n = y.shape[0]
        ids, valid = padded_batch_ids(n, batch_size)
        ce_sum, correct = masked_ce_acc_scan(
            lambda xb: forward_fn(params, xb), x, y, ids, valid
        )
        return ce_sum / n, correct.astype(jnp.float32) / n

    return score
