"""Fast (cmt) parameter layout: conversion round-trip, forward parity with
the reference-layout Pallas pipeline, and exact training-trajectory parity
(elementwise optimizers commute with the layout permutation). Interpret mode
on CPU (f32 kernels — oracles stay tight)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.models import (
    EPSesPlusLinearConfig,
    init_eps_plus_linear,
    eps_plus_linear_forward,
)
from dctn_tpu.models.eps_plus_linear import (
    eps_plus_linear_forward_fast,
    fast_params_from_reference,
    reference_params_from_fast,
)
from dctn_tpu.train import make_optimizer, make_train_step
from dctn_tpu.train.step import make_fast_train_step


def _setup(specs=((3, 3), (2, 4)), image_size=8):
    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=image_size, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        dtype=jnp.float32,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 8, image_size, image_size, 2), jnp.float32
    )
    y = jnp.asarray(np.arange(8) % 10)
    return cfg, params, x, y


def test_fast_conversion_round_trips_exactly():
    cfg, params, _, _ = _setup()
    fast, plans = fast_params_from_reference(params, cfg)
    back = reference_params_from_fast(fast, cfg, plans)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fast_forward_matches_reference_layout():
    cfg, params, x, _ = _setup()
    fast, plans = fast_params_from_reference(params, cfg)
    ref = eps_plus_linear_forward(params, x, cfg, training=False)
    got = eps_plus_linear_forward_fast(fast, x, cfg, plans, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("reg_type", ["epswise", "epses_composition"])
@pytest.mark.parametrize("opt_name", ["sgd", "adam"])
def test_fast_step_trajectory_matches_regular(reg_type, opt_name):
    """3 steps of the fast step == 3 steps of the regular Pallas step,
    converted back — exact up to f32 roundoff (same kernels, same math; the
    optimizer update is elementwise, so it commutes with the cmt
    permutation)."""
    cfg, params, x, y = _setup()
    lr, coeff = 0.05, 1e-3

    opt = make_optimizer(opt_name, lr)
    step = make_train_step(cfg, opt, reg_type, coeff, donate=False)
    p_ref, o_ref = params, opt.init(params)
    for i in range(3):
        p_ref, o_ref, m_ref = step(p_ref, o_ref, jax.random.PRNGKey(5 + i), x, y)

    fast, plans = fast_params_from_reference(params, cfg)
    opt_f = make_optimizer(opt_name, lr)
    fstep = make_fast_train_step(cfg, opt_f, plans, reg_type, coeff, donate=False)
    f, o_f = fast, opt_f.init(fast)
    for i in range(3):
        f, o_f, m_f = fstep(f, o_f, jax.random.PRNGKey(5 + i), x, y)

    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_ref["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_f["reg_term"]), float(m_ref["reg_term"]), rtol=1e-6
    )
    merged = reference_params_from_fast(f, cfg, plans)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_fast_step_learns():
    """Loss decreases over a few fast-layout steps (end-to-end sanity)."""
    cfg, params, x, y = _setup()
    fast, plans = fast_params_from_reference(params, cfg)
    opt = make_optimizer("adam", 3e-3)
    fstep = make_fast_train_step(cfg, opt, plans, "epswise", 1e-6, donate=False)
    f, o = fast, opt.init(fast)
    losses = []
    for i in range(12):
        f, o, m = fstep(f, o, jax.random.PRNGKey(i), x, y)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
