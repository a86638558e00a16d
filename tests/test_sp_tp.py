"""SP x TP composition (data x space x model mesh — parallel/sp_tp.py) on
the virtual 8-device mesh: forward / trajectory / eval parity against
single-device training for both parameter layouts, dropout bit-identity,
freeze + grad-accum, and the full 3-axis (2, 2, 2) mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.models import (
    EPSesPlusLinearConfig,
    init_eps_plus_linear,
    eps_plus_linear_forward,
)
from dctn_tpu.parallel import (
    make_sp_tp_mesh,
    make_sp_tp_train_step,
    make_sp_tp_fast_train_step,
    make_sp_tp_forward,
    make_sp_tp_score_fn,
    make_tp_params,
    merge_tp_params,
    make_tp_fast_params,
    merge_tp_fast_params,
    sp_tp_shard_batch,
)
from dctn_tpu.train import make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


def _setup(dtype=jnp.float64, image_size=6, specs=((2, 3), (2, 4)), n=8,
           dropout_p=1.0, **cfg_kw):
    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=image_size, q0=2, dtype=dtype,
        dropout_p=dropout_p, **cfg_kw,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, n, image_size, image_size, 2), dtype
    )
    y = jnp.asarray(np.arange(n) % 10)
    return cfg, params, x, y


@pytest.mark.parametrize("n_data,n_space,n_model", [(1, 2, 2), (2, 2, 2)])
def test_sp_tp_forward_matches_single_device(n_data, n_space, n_model):
    cfg, params, x, y = _setup()
    mesh = make_sp_tp_mesh(n_data, n_space, n_model)
    params3 = make_tp_params(params, cfg, mesh)
    forward = make_sp_tp_forward(cfg, mesh, params3)
    got = forward(params3, sp_tp_shard_batch(mesh, x))
    ref = eps_plus_linear_forward(params, x, cfg, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)


@pytest.mark.parametrize("reg_type", ["epswise", "epses_composition"])
def test_sp_tp_train_step_matches_single_device(reg_type):
    """3 SGD steps with a regularizer on the full (2, 2, 2) mesh vs the
    single-device step: losses and merged params must agree in f64."""
    cfg, params, x, y = _setup()
    lr, reg_coeff = 0.05, 1e-3

    opt = make_optimizer("sgd", lr)
    step = make_train_step(cfg, opt, reg_type, reg_coeff, donate=False)
    p_ref, o_ref = params, opt.init(params)
    rng = jax.random.PRNGKey(2)
    losses_ref = []
    for _ in range(3):
        p_ref, o_ref, m = step(p_ref, o_ref, rng, x, y)
        losses_ref.append(float(m["loss"]))

    mesh = make_sp_tp_mesh(2, 2, 2)
    opt3 = make_optimizer("sgd", lr)
    st_step = make_sp_tp_train_step(cfg, opt3, mesh, reg_type, reg_coeff)
    p3 = make_tp_params(params, cfg, mesh)
    o3 = jax.jit(opt3.init)(p3)
    xs, ys = sp_tp_shard_batch(mesh, x, y)
    losses = []
    for _ in range(3):
        p3, o3, m3 = st_step(p3, o3, rng, xs, ys)
        losses.append(float(m3["loss"]))

    np.testing.assert_allclose(losses, losses_ref, rtol=1e-12)
    merged = merge_tp_params(p3, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-14
        ),
        p_ref, merged,
    )


def test_sp_tp_dropout_bit_identical():
    """Adam steps at p=0.7: the composed step must realize the SAME mask
    realization as the single-device step (full-shape key chain + O-slice),
    so the trajectories agree to f64 tolerance."""
    cfg, params, x, y = _setup(dropout_p=0.7)
    opt = make_optimizer("adam", 1e-2)
    step = make_train_step(cfg, opt, reg_coeff=0.0, donate=False)
    p_ref, o_ref = params, opt.init(params)
    for i in range(2):
        p_ref, o_ref, m_ref = step(
            p_ref, o_ref, jax.random.fold_in(jax.random.PRNGKey(7), i), x, y
        )

    mesh = make_sp_tp_mesh(2, 2, 2)
    opt3 = make_optimizer("adam", 1e-2)
    st_step = make_sp_tp_train_step(cfg, opt3, mesh)
    p3 = make_tp_params(params, cfg, mesh)
    o3 = jax.jit(opt3.init)(p3)
    xs, ys = sp_tp_shard_batch(mesh, x, y)
    for i in range(2):
        p3, o3, m3 = st_step(
            p3, o3, jax.random.fold_in(jax.random.PRNGKey(7), i), xs, ys
        )
    np.testing.assert_allclose(float(m3["ce"]), float(m_ref["ce"]), rtol=1e-12)
    merged = merge_tp_params(p3, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-13
        ),
        p_ref, merged,
    )


def test_sp_tp_freeze_and_grad_accum_match_single_device():
    cfg, params, x, y = _setup()
    opt = make_optimizer("sgd", 0.05)
    step = make_train_step(
        cfg, opt, reg_coeff=0.0, frozen_eps_indices=(0,),
        grad_accum_steps=2, donate=False,
    )
    p_ref, o_ref = params, opt.init(params)
    rng = jax.random.PRNGKey(4)
    p_ref, o_ref, m_ref = step(p_ref, o_ref, rng, x, y)

    mesh = make_sp_tp_mesh(2, 2, 2)
    opt3 = make_optimizer("sgd", 0.05)
    st_step = make_sp_tp_train_step(
        cfg, opt3, mesh, frozen_eps_indices=(0,), grad_accum_steps=2
    )
    p3 = make_tp_params(params, cfg, mesh)
    o3 = jax.jit(opt3.init)(p3)
    xs, ys = sp_tp_shard_batch(mesh, x, y)
    p3, o3, m3 = st_step(p3, o3, rng, xs, ys)
    np.testing.assert_allclose(float(m3["ce"]), float(m_ref["ce"]), rtol=1e-12)
    merged = merge_tp_params(p3, cfg)
    np.testing.assert_array_equal(  # frozen layer untouched
        np.asarray(merged["epses"][0]), np.asarray(params["epses"][0])
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-14
        ),
        p_ref, merged,
    )


@pytest.mark.parametrize("n_eval", [8, 6])
def test_sp_tp_score_matches_single_device(n_eval):
    """Padded/ragged eval on the 3-axis mesh vs the single-device score."""
    from dctn_tpu.train import make_score_fn

    cfg, params, x, y = _setup()
    x, y = x[:, :n_eval], y[:n_eval]
    score_ref = make_score_fn(cfg, batch_size=4)
    mce_ref, acc_ref = score_ref(params, x, y)

    mesh = make_sp_tp_mesh(2, 2, 2)
    params3 = make_tp_params(params, cfg, mesh)
    score = make_sp_tp_score_fn(cfg, mesh, batch_size=2, params3=params3)
    xs = sp_tp_shard_batch(mesh, x)
    mce, acc = score(params3, xs, y)
    np.testing.assert_allclose(float(mce), float(mce_ref), rtol=1e-10)
    np.testing.assert_allclose(float(acc), float(acc_ref), rtol=1e-12)


def test_sp_tp_fast_layout_matches_single_device_fast():
    """The fast (cmt) Pallas pipeline on the full (2, 2, 2) mesh: 2 Adam
    steps WITH dropout + both regularizer types' metrics vs the
    single-device fast step (interpret-mode kernels on CPU)."""
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
    from dctn_tpu.train.step import make_fast_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        dropout_p=0.8, dtype=jnp.float32,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 8, 6, 6, 2), jnp.float32
    )
    y = jnp.asarray(np.arange(8) % 10)
    fast, plans = fast_params_from_reference(params, cfg)

    opt = make_optimizer("adam", 1e-2)
    step1 = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-4, donate=False
    )
    f1, o1 = fast, opt.init(fast)
    for i in range(2):
        f1, o1, m1 = step1(
            f1, o1, jax.random.fold_in(jax.random.PRNGKey(7), i), x, y
        )

    mesh = make_sp_tp_mesh(2, 2, 2)
    fast3 = make_tp_fast_params(fast, cfg, mesh)
    opt3 = make_optimizer("adam", 1e-2)
    step3 = make_sp_tp_fast_train_step(
        cfg, opt3, plans, mesh, "epswise", 1e-4
    )
    f3, o3 = fast3, jax.jit(opt3.init)(fast3)
    xs, ys = sp_tp_shard_batch(mesh, x, y)
    for i in range(2):
        f3, o3, m3 = step3(
            f3, o3, jax.random.fold_in(jax.random.PRNGKey(7), i), xs, ys
        )
    np.testing.assert_allclose(float(m1["ce"]), float(m3["ce"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["reg_term"]), float(m3["reg_term"]), rtol=1e-5
    )
    merged = merge_tp_fast_params(f3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(f1), jax.tree_util.tree_leaves(merged)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )

    # fast eval on the composed mesh
    from dctn_tpu.models.eps_plus_linear import eps_plus_linear_forward_fast
    from dctn_tpu.train import make_score_fn

    fwd = lambda f, xb: eps_plus_linear_forward_fast(  # noqa: E731
        f, xb, cfg, plans, training=False
    )
    score1 = make_score_fn(cfg, batch_size=4, forward_fn=fwd)
    mce1, acc1 = score1(f1, x, y)
    score3 = make_sp_tp_score_fn(
        cfg, mesh, batch_size=2, params3=f3, fast_plans=plans
    )
    mce3, acc3 = score3(f3, sp_tp_shard_batch(mesh, x), y)
    np.testing.assert_allclose(float(mce1), float(mce3), rtol=2e-4)
    np.testing.assert_allclose(float(acc1), float(acc3), rtol=1e-6)


def test_sp_tp_halo_constraint_raises():
    cfg, params, x, y = _setup(image_size=6, specs=((4, 3), (2, 4)))
    mesh = make_sp_tp_mesh(1, 4, 2)
    with pytest.raises(ValueError, match="halo"):
        make_sp_tp_train_step(cfg, make_optimizer("sgd", 0.1), mesh)
