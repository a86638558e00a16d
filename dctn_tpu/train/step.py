"""The jitted training step.

Replaces the reference's imperative forward/backward/step
(dctn/training.py:65-87) with ONE compiled XLA program per step: dropout mask
draw, forward, CE + reg, backward, frozen-core masking, optimizer update —
all fused on device. Batches are gathered on device from the resident split
(no host↔device copies in steady state).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..models.eps_plus_linear import (
    EPSesPlusLinearConfig,
    eps_plus_linear_forward,
    epswise_l2_regularizer,
    epses_composition_l2_regularizer,
)

REGULARIZERS = {
    "epswise": epswise_l2_regularizer,
    "epses_composition": epses_composition_l2_regularizer,
}


def make_fast_reg_fn(cfg: EPSesPlusLinearConfig, plans, reg_type: str):
    """Regularizer over the FAST (cmt) parameter layout. The epswise L2 is
    permutation-invariant, so it computes the EXACT reference value directly
    on the cmt leaves; the composition regularizer runs the cmt-native
    matricized recursion (``composition.inner_product_cmt``) — the old
    unpermute-to-N-D-cores path cost 3.3 ms/step of its own backward on the
    deep three-EPS config (tiny-trailing-dim cores tile-pad ×~128)."""
    from ..ops import composition

    def reg_fn(fast):
        if reg_type == "epswise":
            return jnp.sum(fast["linear"]["w"] ** 2) + sum(
                jnp.sum(c**2) for c in fast["epses_cmt"]
            )
        return jnp.sum(fast["linear"]["w"] ** 2) + composition.inner_product_cmt(
            fast["epses_cmt"], plans
        )

    return reg_fn


def grad_accum_scan(loss_fn, params, xb, yb, rng, steps: int,
                    with_probs: bool = False):
    """Microbatched value_and_grad: scan ``steps`` equal slices of the batch
    (x batch axis 1, y axis 0), averaging losses and gradients — bounds
    activation memory at very large batches. ``loss_fn(params, xs, ys, r) →
    (loss, aux)`` with aux[0]=ce, aux[1]=reg. Shared by the single-device
    and tensor-parallel steps. Returns (loss, ce, reg, grads).

    ``with_probs``: loss_fn must additionally return per-sample
    probabilities at aux[2]; the scan stacks each microbatch's and the
    concatenation (batch order restored) comes back as a fifth result —
    how ``--tb-batches`` composes with gradient accumulation."""
    b = yb.shape[0]
    assert b % steps == 0
    mb = b // steps
    xm = xb.reshape(xb.shape[0], steps, mb, *xb.shape[2:])
    xm = jnp.moveaxis(xm, 1, 0)  # (steps, C, mb, H, W, Q)
    ym = yb.reshape(steps, mb)
    rngs = jax.random.split(rng, steps)

    def body(carry, inp):
        loss_sum, ce_sum, reg_last, grad_sum = carry
        xs, ys, r = inp
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, xs, ys, r
        )
        grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, g)
        out = aux[2] if with_probs else None
        return (loss_sum + l, ce_sum + aux[0], aux[1], grad_sum), out

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    acc_dtype = jax.tree_util.tree_leaves(params)[0].dtype
    zero = jnp.zeros((), acc_dtype)
    (loss_sum, ce_sum, reg, grads), probs = jax.lax.scan(
        body, (zero, zero, zero, zero_grads), (xm, ym, rngs)
    )
    inv = 1.0 / steps
    grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
    if with_probs:
        # (steps, mb) → (b,): slices were taken in batch order
        return loss_sum * inv, ce_sum * inv, reg, grads, probs.reshape(-1)
    return loss_sum * inv, ce_sum * inv, reg, grads


def _hoist_reg(loss, grads, params, reg_fn, reg_coeff):
    """Add the parameter-only regularizer ONCE after a grad-accum scan.
    Exact up to float reduction order: mean_i(ce_i) + c·reg equals
    mean_i(ce_i + c·reg), and one c·∇reg equals the scan's averaged
    per-microbatch copies — but computing reg inside the scan multiplied
    its fwd+bwd cost by the accumulation count (the deep config's
    composition reg is ~1.1 ms; accum 4 paid 3 extra copies, ~2% of the
    step). Single-device factories only — the TP/SP steps keep reg inside
    their per-shard losses, where the collective reduction rules for the
    reg gradients are encoded (parallel/sp_tp.py docstring)."""
    if reg_coeff == 0.0:
        return loss, jnp.zeros_like(loss), grads
    reg, reg_grads = jax.value_and_grad(reg_fn)(params)
    grads = jax.tree_util.tree_map(
        lambda g, rg: g + reg_coeff * rg.astype(g.dtype), grads, reg_grads
    )
    return loss + reg_coeff * reg, reg, grads


def make_train_step(
    cfg: EPSesPlusLinearConfig,
    optimizer: optax.GradientTransformation,
    reg_type: str = "epses_composition",
    reg_coeff: float = 0.0,
    frozen_eps_indices: Sequence[int] = (),
    donate: bool = True,
    with_probs: bool = False,
    grad_accum_steps: int = 1,
):
    """Returns step(params, opt_state, rng, xb, yb) →
    (params, opt_state, metrics) with metrics = {loss, ce, reg_term} scalars
    (+ per-sample ``probs_of_true_class`` when ``with_probs`` — the batch
    observability hook, new_runner.py:512-531).

    Frozen EPS cores (``--freeze-eps`` parity, new_runner.py:443-444) get
    their gradients zeroed before the optimizer update, so moments stay
    untouched too.
    """
    reg_fn = REGULARIZERS[reg_type]
    frozen = frozenset(frozen_eps_indices)

    def loss_fn(params, xb, yb, rng):
        logits = eps_plus_linear_forward(params, xb, cfg, training=True, rng=rng)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))
        reg = reg_fn(params) if reg_coeff != 0.0 else jnp.zeros((), logits.dtype)
        return ce + reg_coeff * reg, (ce, reg)

    def mask_frozen(grads):
        if not frozen:
            return grads
        epses = tuple(
            jnp.zeros_like(g) if i in frozen else g
            for i, g in enumerate(grads["epses"])
        )
        return {**grads, "epses": epses}

    def loss_with_probs(params, xb, yb, rng):
        logits = eps_plus_linear_forward(params, xb, cfg, training=True, rng=rng)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_sample = jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
        ce = -jnp.mean(per_sample)
        reg = reg_fn(params) if reg_coeff != 0.0 else jnp.zeros((), logits.dtype)
        return ce + reg_coeff * reg, (ce, reg, jnp.exp(per_sample))

    # CE-only variants for the accumulation scan: the reg is added ONCE
    # after the scan (_hoist_reg) instead of once per microbatch
    def ce_only(params, xb, yb, rng):
        logits = eps_plus_linear_forward(params, xb, cfg, training=True, rng=rng)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))
        return ce, (ce, jnp.zeros_like(ce))

    def ce_only_probs(params, xb, yb, rng):
        logits = eps_plus_linear_forward(params, xb, cfg, training=True, rng=rng)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_sample = jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
        ce = -jnp.mean(per_sample)
        return ce, (ce, jnp.zeros_like(ce), jnp.exp(per_sample))

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, rng, xb, yb):
        fn = loss_with_probs if with_probs else loss_fn
        if grad_accum_steps == 1:
            (loss, aux), grads = jax.value_and_grad(fn, has_aux=True)(
                params, xb, yb, rng
            )
        elif with_probs:
            loss, ce, _z, grads, probs = grad_accum_scan(
                ce_only_probs, params, xb, yb, rng, grad_accum_steps,
                with_probs=True,
            )
            loss, reg, grads = _hoist_reg(loss, grads, params, reg_fn, reg_coeff)
            aux = (ce, reg, probs)
        else:
            loss, ce, _z, grads = grad_accum_scan(
                ce_only, params, xb, yb, rng, grad_accum_steps
            )
            loss, reg, grads = _hoist_reg(loss, grads, params, reg_fn, reg_coeff)
            aux = (ce, reg)
        grads = mask_frozen(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "ce": aux[0], "reg_term": aux[1]}
        if with_probs:
            metrics["probs_of_true_class"] = aux[2]
        return params, opt_state, metrics

    return step


def make_fast_train_step(
    cfg: EPSesPlusLinearConfig,
    optimizer: optax.GradientTransformation,
    plans,
    reg_type: str = "epswise",
    reg_coeff: float = 0.0,
    donate: bool = True,
    frozen_eps_indices: Sequence[int] = (),
    with_probs: bool = False,
    grad_accum_steps: int = 1,
    qat: Optional[str] = None,
):
    """Training step over the FAST (cmt) parameter layout
    (models/eps_plus_linear.fast_params_from_reference): the Pallas pipeline
    consumes the matricized cores directly, eliminating the per-step
    10-D→matrix transposes (~3.2 ms/step on the flagship, batch-independent)
    and running the optimizer on clean 2-D shapes.

    The epswise regularizer is permutation-invariant, so it computes the
    EXACT reference value on the cmt leaves. The composition regularizer
    needs the 10-D cores and unpermutes per step (re-adding transpose cost —
    prefer epswise with this step). Trajectories equal the regular Pallas
    step's exactly, INCLUDING dropout p<1 (masks are drawn reference-order
    and permuted — _dropout_cmts) — elementwise optimizers commute with the
    layout permutation; see tests/test_fast_layout.py. ``frozen_eps_indices``
    / ``with_probs`` / ``grad_accum_steps`` mirror make_train_step so the
    runner's full option surface stays on the fast path.

    ``qat="int8"`` swaps each EPS layer's forward matmul for the W8A8
    int8 kernel with straight-through gradients
    (pallas/eps_pallas_q8.forward_fast_q8train): training numerics then
    match an ``export --quantize int8`` deployment, and the forward runs at
    the int8 MXU rate. NOT trajectory-equal to the reference — an explicit
    opt-in (`--qat int8`)."""
    from ..models.eps_plus_linear import eps_plus_linear_forward_fast

    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    if qat == "int8":
        from ..pallas.eps_pallas_q8 import forward_fast_q8train as _fwd
    else:
        _fwd = eps_plus_linear_forward_fast

    frozen = frozenset(frozen_eps_indices)
    reg_fn = make_fast_reg_fn(cfg, plans, reg_type)

    def loss_fn(fast, xb, yb, rng):
        logits = _fwd(
            fast, xb, cfg, plans, training=True, rng=rng
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_sample = jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
        ce = -jnp.mean(per_sample)
        reg = reg_fn(fast) if reg_coeff != 0.0 else jnp.zeros((), logits.dtype)
        return ce + reg_coeff * reg, (ce, reg, jnp.exp(per_sample))

    def mask_frozen(grads):
        if not frozen:
            return grads
        cmts = tuple(
            jnp.zeros_like(g) if i in frozen else g
            for i, g in enumerate(grads["epses_cmt"])
        )
        return {**grads, "epses_cmt": cmts}

    def ce_only_probs(fast, xb, yb, rng):
        # CE-only for the accumulation scan: reg is hoisted out (_hoist_reg)
        logits = _fwd(fast, xb, cfg, plans, training=True, rng=rng)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_sample = jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
        ce = -jnp.mean(per_sample)
        return ce, (ce, jnp.zeros_like(ce), jnp.exp(per_sample))

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(fast, opt_state, rng, xb, yb):
        if grad_accum_steps == 1:
            (loss, (ce, reg, probs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(fast, xb, yb, rng)
        elif with_probs:
            loss, ce, _z, grads, probs = grad_accum_scan(
                ce_only_probs, fast, xb, yb, rng, grad_accum_steps,
                with_probs=True,
            )
            loss, reg, grads = _hoist_reg(loss, grads, fast, reg_fn, reg_coeff)
        else:
            loss, ce, _z, grads = grad_accum_scan(
                lambda p, xs, ys, r: (lambda v: (v[0], v[1][:2]))(
                    ce_only_probs(p, xs, ys, r)
                ),
                fast, xb, yb, rng, grad_accum_steps,
            )
            loss, reg, grads = _hoist_reg(loss, grads, fast, reg_fn, reg_coeff)
            probs = None
        grads = mask_frozen(grads)
        updates, opt_state = optimizer.update(grads, opt_state, fast)
        fast = optax.apply_updates(fast, updates)
        metrics = {"loss": loss, "ce": ce, "reg_term": reg}
        if with_probs:
            metrics["probs_of_true_class"] = probs
        return fast, opt_state, metrics

    return step


def make_gather_batch(x_full: jax.Array, y_full: jax.Array):
    """Device-side batch gather from the resident split: idx (B,) → (xb, yb).
    Jitted; the split arrays stay on device across all calls."""

    @jax.jit
    def gather(idx):
        return jnp.take(x_full, idx, axis=1), jnp.take(y_full, idx, axis=0)

    return gather
