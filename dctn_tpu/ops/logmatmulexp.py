"""Numerically stable log-space matrix multiplication.

logmatmulexp(A, B) = log(exp(A) @ exp(B)) for log-domain tensor-network
contraction (parity: reference ``dctn/logmatmulexp.py``).

TPU-first design: instead of materializing the (ϴ, R, I) broadcast sum and
logsumexp-ing it (the reference's approach, 165× slower than matmul on GPU),
we use the max-shift identity

    log(exp(A) @ exp(B)) = a_max + b_max + log(exp(A - a_max) @ exp(B - b_max))

with row/column maxima, which turns the inner computation into ONE true MXU
matmul of exponentials plus elementwise work. This is both faster (matmul-rate
instead of broadcast-rate) and as stable as the logsumexp form: every exp
argument is ≤ 0.

``logmatmulexp_lowmem`` wraps it in jax.checkpoint so the exp intermediates are
recomputed in the backward pass instead of stored (parity with the
torch.utils.checkpoint variant, logmatmulexp.py:17-22).

A fused Pallas kernel (single pass over tiles, f32 accumulation) lives in
``pallas/logmatmulexp_pallas.py`` and is used automatically on TPU for large
shapes; this module is the reference/fallback implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logmatmulexp(log_a: jax.Array, log_b: jax.Array) -> jax.Array:
    """log(exp(log_a) @ exp(log_b)), stable, MXU-friendly.

    log_a: (ϴ, R), log_b: (R, I) → (ϴ, I). Handles -inf entries (zero
    probabilities) like logsumexp does.
    """
    assert log_a.ndim == 2 and log_b.ndim == 2 and log_a.shape[1] == log_b.shape[0]
    a_max = jnp.max(log_a, axis=1, keepdims=True)  # (ϴ, 1)
    b_max = jnp.max(log_b, axis=0, keepdims=True)  # (1, I)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)
    ea = jnp.exp(log_a - a_max)
    eb = jnp.exp(log_b - b_max)
    prod = jax.lax.dot_general(
        ea,
        eb,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.promote_types(log_a.dtype, log_b.dtype),
    )
    return jnp.log(prod) + a_max + b_max


def logmatmulexp_lowmem(log_a: jax.Array, log_b: jax.Array) -> jax.Array:
    """Same, but rematerializes intermediates in the backward pass."""
    return jax.checkpoint(logmatmulexp)(log_a, log_b)


def logmatmulexp_reference(log_a: jax.Array, log_b: jax.Array) -> jax.Array:
    """Broadcast + logsumexp form (the reference's algorithm,
    logmatmulexp.py:5-14). O(ϴ·R·I) memory; used as a numerical oracle."""
    theta, r = log_a.shape
    i = log_b.shape[1]
    pairwise = log_a[:, :, None] + log_b[None, :, :]  # (ϴ, R, I)
    return jax.scipy.special.logsumexp(pairwise, axis=1)
