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


@pytest.mark.parametrize(
    "specs,image_size",
    [
        (((3, 3), (2, 4)), 8),
        (((4, 4), (3, 12), (2, 24)), 28),  # the deep config whose reg
        # backward cost 3.3 ms/step on the old unpermute-to-N-D path
        (((2, 4), (2, 2), (2, 6)), 12),  # an out_size=2 mid layer → the
        # NEXT layer merges factor pairs with a live M (M⊗M per merged leg)
    ],
)
def test_inner_product_cmt_matches_reference(specs, image_size):
    """The cmt-native composition inner product (the fast step's
    epses_composition regularizer) equals the reference-layout recursion in
    f64, value AND gradient (gradient compared through the exact layout
    permutation)."""
    from dctn_tpu.ops import composition as C

    cfg, params, _, _ = _setup(specs, image_size)
    fast, plans = fast_params_from_reference(params, cfg)
    e64 = tuple(jnp.asarray(e, jnp.float64) for e in params["epses"])
    c64 = tuple(c.astype(jnp.float64) for c in fast["epses_cmt"])
    ref, g_ref = jax.value_and_grad(lambda es: C.inner_product(es, es))(e64)
    got, g_cmt = jax.value_and_grad(lambda cs: C.inner_product_cmt(cs, plans))(
        c64
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)
    back = reference_params_from_fast(
        {"epses_cmt": g_cmt, "linear": {}}, cfg, plans
    )
    for a, b in zip(back["epses"], g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-13
        )


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
    # the fast step's composition regularizer runs the cmt-native matricized
    # recursion (composition.inner_product_cmt) — same math, different f32
    # association order than the reference-layout recursion (f64 equality is
    # pinned in test_fast_layout.py::test_inner_product_cmt_matches_reference)
    np.testing.assert_allclose(
        float(m_f["reg_term"]), float(m_ref["reg_term"]), rtol=1e-5
    )
    merged = reference_params_from_fast(f, cfg, plans)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_fast_step_trajectory_matches_regular_with_dropout():
    """Fast-layout dropout draws masks in REFERENCE order and permutes them
    to cmt (_dropout_cmts), so p<1 trajectories are bit-identical to the
    reference-layout Pallas step — the r2 gate condition removed in r3."""
    cfg0, params, x, y = _setup()
    cfg = EPSesPlusLinearConfig(
        epses_specs=cfg0.epses_specs, image_size=cfg0.image_size, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        dropout_p=0.7,
    )
    opt = make_optimizer("adam", 0.01)
    step = make_train_step(cfg, opt, "epswise", 1e-3, donate=False)
    p_ref, o_ref = params, opt.init(params)
    for i in range(3):
        p_ref, o_ref, m_ref = step(p_ref, o_ref, jax.random.PRNGKey(9 + i), x, y)

    fast, plans = fast_params_from_reference(params, cfg)
    opt_f = make_optimizer("adam", 0.01)
    fstep = make_fast_train_step(cfg, opt_f, plans, "epswise", 1e-3, donate=False)
    f, o_f = fast, opt_f.init(fast)
    for i in range(3):
        f, o_f, m_f = fstep(f, o_f, jax.random.PRNGKey(9 + i), x, y)

    np.testing.assert_allclose(float(m_f["loss"]), float(m_ref["loss"]), rtol=1e-6)
    merged = reference_params_from_fast(f, cfg, plans)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_fast_forward_bf16_compute_dtype():
    """compute_dtype=bfloat16 plumbs through the fast pipeline (mm_dtype for
    the kernels): the forward matches the f32 pipeline at bf16 tolerances
    and matches the reference-layout pipeline at the SAME compute_dtype
    exactly."""
    cfg0, params, x, _ = _setup()
    cfg16 = EPSesPlusLinearConfig(
        epses_specs=cfg0.epses_specs, image_size=cfg0.image_size, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        compute_dtype=jnp.bfloat16,
    )
    fast, plans = fast_params_from_reference(params, cfg16)
    got16 = eps_plus_linear_forward_fast(fast, x, cfg16, plans, training=False)
    ref32 = eps_plus_linear_forward(params, x, cfg0, training=False)
    # bf16 MXU operands, f32 accumulate: ~3 decimal digits
    np.testing.assert_allclose(
        np.asarray(got16), np.asarray(ref32), rtol=0.05, atol=0.02
    )
    ref16 = eps_plus_linear_forward(params, x, cfg16, training=False)
    np.testing.assert_allclose(
        np.asarray(got16), np.asarray(ref16), rtol=1e-6, atol=1e-7
    )


def test_fast_step_bf16_learns():
    """bf16-compute trajectory sanity: the fast step trains at
    compute_dtype=bfloat16 (VERDICT r2 missing #4)."""
    cfg0, params, x, y = _setup()
    cfg = EPSesPlusLinearConfig(
        epses_specs=cfg0.epses_specs, image_size=cfg0.image_size, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        compute_dtype=jnp.bfloat16,
    )
    fast, plans = fast_params_from_reference(params, cfg)
    opt = make_optimizer("adam", 3e-3)
    fstep = make_fast_train_step(cfg, opt, plans, "epswise", 1e-6, donate=False)
    f, o = fast, opt.init(fast)
    losses = []
    for i in range(12):
        f, o, m = fstep(f, o, jax.random.PRNGKey(i), x, y)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_fast_step_freeze_probs_accum_match_regular():
    """freeze-eps, tb-batches (with_probs) and grad-accum now run natively on
    the fast step — each matches the regular step's trajectory/outputs."""
    cfg, params, x, y = _setup()
    opt = make_optimizer("adam", 0.01)
    step = make_train_step(
        cfg, opt, "epswise", 1e-3, donate=False,
        frozen_eps_indices=(0,), with_probs=True,
    )
    p_ref, o_ref = params, opt.init(params)
    p_ref, o_ref, m_ref = step(p_ref, o_ref, jax.random.PRNGKey(3), x, y)

    fast, plans = fast_params_from_reference(params, cfg)
    opt_f = make_optimizer("adam", 0.01)
    fstep = make_fast_train_step(
        cfg, opt_f, plans, "epswise", 1e-3, donate=False,
        frozen_eps_indices=(0,), with_probs=True,
    )
    f, o_f = fast, opt_f.init(fast)
    f, o_f, m_f = fstep(f, o_f, jax.random.PRNGKey(3), x, y)
    np.testing.assert_allclose(
        np.asarray(m_f["probs_of_true_class"]),
        np.asarray(m_ref["probs_of_true_class"]),
        rtol=1e-6,
    )
    merged = reference_params_from_fast(f, cfg, plans)
    # frozen core 0 unchanged, and equal to the regular step's result
    np.testing.assert_array_equal(
        np.asarray(merged["epses"][0]), np.asarray(params["epses"][0])
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)

    # grad accumulation: 2 microbatches == full batch (no dropout, linear in
    # the gradient average)
    astep = make_fast_train_step(
        cfg, opt_f, plans, "epswise", 1e-3, donate=False, grad_accum_steps=2,
    )
    f2, o2 = fast_params_from_reference(params, cfg)[0], opt_f.init(fast)
    f2, o2, m2 = astep(f2, o2, jax.random.PRNGKey(3), x, y)
    fstep_plain = make_fast_train_step(
        cfg, opt_f, plans, "epswise", 1e-3, donate=False
    )
    f3, o3 = fast_params_from_reference(params, cfg)[0], opt_f.init(fast)
    f3, o3, m3 = fstep_plain(f3, o3, jax.random.PRNGKey(3), x, y)
    np.testing.assert_allclose(float(m2["loss"]), float(m3["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(f2), jax.tree_util.tree_leaves(f3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


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


def test_saved_t_capped_layers_flagship():
    """saved_t_capped_layers pins the measured bs-8192 falloff: the flagship
    L1 t buffer tops the 4 GB HBM cap at microbatch 8192 (so the backward ran
    the 3-matmul recompute, 22.6k img/s) but fits at 2048 (the grad-accum-4
    large-batch recipe, 27.5k — docs/performance.md). L0 is never listed: it
    is force_two_pass (d_views DCEd) and its merged a=256 < MIN_A anyway."""
    from dctn_tpu.models.eps_plus_linear import (
        fast_layer_plans,
        saved_t_capped_layers,
    )

    cfg = EPSesPlusLinearConfig(epses_specs=((4, 4), (3, 6)), image_size=28)
    plans = fast_layer_plans(cfg)
    assert saved_t_capped_layers(cfg, plans, 8192) == [1]
    assert saved_t_capped_layers(cfg, plans, 4096) == [1]
    assert saved_t_capped_layers(cfg, plans, 2048) == []
    assert saved_t_capped_layers(cfg, plans, 128) == []


def test_runner_hints_grad_accum_for_capped_saved_t(caplog):
    """The runner's saved-t hint reproduces the documented recipe: at batch
    8192 / accum 1 it suggests exactly --grad-accum-steps 4 (the measured
    +22% configuration); at 2048, or once accum 4 is set, it stays silent."""
    import logging

    from dctn_tpu.cli.runner import _hint_saved_t_recipe
    from dctn_tpu.models.eps_plus_linear import fast_layer_plans

    cfg = EPSesPlusLinearConfig(epses_specs=((4, 4), (3, 6)), image_size=28)
    plans = fast_layer_plans(cfg)
    with caplog.at_level(logging.WARNING, logger="dctn_tpu.cli.runner"):
        _hint_saved_t_recipe(cfg, plans, 8192, 1)
    assert "--grad-accum-steps 4" in caplog.text
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="dctn_tpu.cli.runner"):
        _hint_saved_t_recipe(cfg, plans, 2048, 1)
        _hint_saved_t_recipe(cfg, plans, 8192, 4)
    assert caplog.text == ""


def test_auto_grad_accum_resolution():
    """--grad-accum-steps auto resolves to the smallest power-of-2
    accumulation that un-caps saved-t: 4 at per-device batch 8192 on the
    flagship config (the documented +22% recipe), 1 at 2048, and always 1
    off the fast plans (XLA path)."""
    from dctn_tpu.cli.runner import _resolve_auto_grad_accum
    from dctn_tpu.models.eps_plus_linear import fast_layer_plans

    cfg = EPSesPlusLinearConfig(epses_specs=((4, 4), (3, 6)), image_size=28)
    plans = fast_layer_plans(cfg)
    assert _resolve_auto_grad_accum(cfg, plans, 8192) == 4
    assert _resolve_auto_grad_accum(cfg, plans, 4096) == 2
    assert _resolve_auto_grad_accum(cfg, plans, 2048) == 1
    assert _resolve_auto_grad_accum(cfg, plans, 128) == 1
    assert _resolve_auto_grad_accum(cfg, None, 8192) == 1


def test_fast_layout_multichannel_cifar_shape():
    """C=3 inputs (the CIFAR colored family, K=2, q=2/channel → layer-0
    n=12): fast (cmt) conversion, forward parity, and a 2-step trajectory vs
    the reference-layout Pallas step. Channels enter only through layer 0's
    core rank; empirical init infers C from the input exactly like the
    reference (epses_composition.py:91-105)."""
    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4), (2, 5)), image_size=6, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
    )
    init_x = jax.random.uniform(
        jax.random.PRNGKey(0), (3, 16, 6, 6, 2), jnp.float32
    )
    params = init_eps_plus_linear(
        jax.random.PRNGKey(1), cfg, "unit_empirical_output_std",
        init_input=init_x, init_batch_size=8,
    )
    assert params["epses"][0].ndim == 2 * 2 * 3 + 1  # K²·C input dims + out

    fast, plans = fast_params_from_reference(params, cfg)
    assert plans[0]["c"] == 3
    back = reference_params_from_fast(fast, cfg, plans)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 8, 6, 6, 2), jnp.float32)
    ref = eps_plus_linear_forward(params, x, cfg, training=False)
    got = eps_plus_linear_forward_fast(fast, x, cfg, plans, training=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-6
    )

    y = jnp.asarray(np.arange(8) % 10)
    opt = make_optimizer("adam", 0.01)
    step = make_train_step(cfg, opt, "epswise", 1e-3, donate=False)
    p_ref, o_ref = params, opt.init(params)
    fstep = make_fast_train_step(cfg, opt, plans, "epswise", 1e-3, donate=False)
    f, o_f = fast, opt.init(fast)
    for i in range(2):
        p_ref, o_ref, m_ref = step(p_ref, o_ref, jax.random.PRNGKey(7 + i), x, y)
        f, o_f, m_f = fstep(f, o_f, jax.random.PRNGKey(7 + i), x, y)
    np.testing.assert_allclose(float(m_f["loss"]), float(m_ref["loss"]), rtol=1e-6)
    merged = reference_params_from_fast(f, cfg, plans)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)
