"""Tensor parallelism (model-axis sharding of the last EPS core + linear
head) on the virtual mesh: forward and one-train-step parity against
single-device training, composed with the data axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.models import (
    EPSesPlusLinearConfig,
    init_eps_plus_linear,
    eps_plus_linear_forward,
)
from dctn_tpu.train import make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh"
)


def _setup(dtype=jnp.float64, shard_all=False):
    # shard_all needs every core's output dim divisible by the model axis
    specs = ((2, 4), (2, 4)) if shard_all else ((2, 3), (2, 4))
    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=6, q0=2, dtype=dtype
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 8, 6, 6, 2), dtype
    )
    y = jnp.asarray(np.arange(8) % 10)
    return cfg, params, x, y


@pytest.mark.parametrize("shard_all", [False, True])
def test_tp_forward_matches_single_device(shard_all):
    from dctn_tpu.parallel import make_tp_mesh, make_tp_params, make_tp_forward

    cfg, params, x, y = _setup(shard_all=shard_all)
    mesh = make_tp_mesh(2, 2)
    params3 = make_tp_params(params, cfg, mesh, shard_all)
    forward = make_tp_forward(cfg, mesh, params3, shard_all)
    got = forward(params3, x)
    ref = eps_plus_linear_forward(params, x, cfg, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)


@pytest.mark.parametrize("shard_all", [False, True])
@pytest.mark.parametrize("reg_type", ["epswise", "epses_composition"])
def test_tp_train_step_matches_single_device(reg_type, shard_all):
    from dctn_tpu.parallel import (
        make_tp_mesh,
        make_tp_params,
        merge_tp_params,
        make_tp_train_step,
    )

    cfg, params, x, y = _setup(shard_all=shard_all)
    lr, reg_coeff = 0.05, 1e-3

    # single-device reference trajectory (2 steps)
    opt = make_optimizer("sgd", lr)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, reg_type, reg_coeff, donate=False)
    p_ref, o_ref = params, opt_state
    rng = jax.random.PRNGKey(2)
    losses_ref = []
    for _ in range(2):
        p_ref, o_ref, m = step(p_ref, o_ref, rng, x, y)
        losses_ref.append(float(m["loss"]))

    # TP over a (2 data, 2 model) mesh
    mesh = make_tp_mesh(2, 2)
    params3 = make_tp_params(params, cfg, mesh, shard_all)
    opt_tp = make_optimizer("sgd", lr)
    o3 = jax.jit(opt_tp.init)(params3)
    tp_step = make_tp_train_step(
        cfg, opt_tp, mesh, reg_type, reg_coeff, shard_all=shard_all
    )
    losses_tp = []
    for _ in range(2):
        params3, o3, m3 = tp_step(params3, o3, rng, x, y)
        losses_tp.append(float(m3["loss"]))

    np.testing.assert_allclose(losses_tp, losses_ref, rtol=1e-11)
    merged = merge_tp_params(params3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-13)


def test_tp_adam_state_sharding_propagates():
    """Adam's moment pytrees must inherit the param shardings under jit with
    the update outside shard_map."""
    from dctn_tpu.parallel import make_tp_mesh, make_tp_params, make_tp_train_step

    cfg, params, x, y = _setup(jnp.float32)
    mesh = make_tp_mesh(2, 2)
    params3 = make_tp_params(params, cfg, mesh)
    opt = make_optimizer("adam", 1e-3)
    o3 = jax.jit(opt.init)(params3)
    tp_step = make_tp_train_step(cfg, opt, mesh, "epswise", 1e-4)
    p2, o2, m = tp_step(params3, o3, jax.random.PRNGKey(0), x, y)
    assert bool(jnp.isfinite(m["loss"]))
    # the last core's moments are model-sharded like the core itself
    mu_last = o2[0].mu["epses"][-1]
    spec = mu_last.sharding.spec
    assert "model" in jax.tree_util.tree_leaves(tuple(spec))


def test_tp_shard_all_four_way_model_axis():
    """shard_all over a 1×4 mesh: all_gather/reduce_scatter with >2 shards,
    every core's output dim split four ways."""
    from dctn_tpu.parallel import (
        make_tp_mesh,
        make_tp_params,
        merge_tp_params,
        make_tp_train_step,
    )

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4), (2, 8)), image_size=6, q0=2, dtype=jnp.float64
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 6, 6, 2), jnp.float64)
    y = jnp.asarray(np.arange(8) % 10)

    opt = make_optimizer("sgd", 0.05)
    step = make_train_step(cfg, opt, "epses_composition", 1e-3, donate=False)
    p_ref, o_ref, m_ref = step(params, opt.init(params), jax.random.PRNGKey(2), x, y)

    mesh = make_tp_mesh(1, 4)
    params3 = make_tp_params(params, cfg, mesh, shard_all=True)
    for c in params3["epses"]:
        assert "model" in jax.tree_util.tree_leaves(tuple(c.sharding.spec))
    opt_tp = make_optimizer("sgd", 0.05)
    o3 = jax.jit(opt_tp.init)(params3)
    tp_step = make_tp_train_step(
        cfg, opt_tp, mesh, "epses_composition", 1e-3, shard_all=True
    )
    p3, o3, m3 = tp_step(params3, o3, jax.random.PRNGKey(2), x, y)
    np.testing.assert_allclose(float(m3["loss"]), float(m_ref["loss"]), rtol=1e-11)
    merged = merge_tp_params(p3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("shard_all", [False, True])
def test_tp_freeze_and_grad_accum_match_single_device(shard_all):
    """freeze-eps + gradient accumulation inside the TP step: 2-step
    trajectory equals the single-device step with the same options (and the
    frozen core must not move)."""
    from dctn_tpu.parallel import (
        make_tp_mesh,
        make_tp_params,
        merge_tp_params,
        make_tp_train_step,
    )

    cfg, params, x, y = _setup(shard_all=shard_all)
    opt = make_optimizer("sgd", 0.05)
    step = make_train_step(
        cfg, opt, "epswise", 1e-3, frozen_eps_indices=(0,),
        grad_accum_steps=2, donate=False,
    )
    p_ref, o_ref = params, opt.init(params)
    for _ in range(2):
        p_ref, o_ref, m_ref = step(p_ref, o_ref, jax.random.PRNGKey(2), x, y)

    mesh = make_tp_mesh(2, 2)
    params3 = make_tp_params(params, cfg, mesh, shard_all)
    opt_tp = make_optimizer("sgd", 0.05)
    o3 = jax.jit(opt_tp.init)(params3)
    tp_step = make_tp_train_step(
        cfg, opt_tp, mesh, "epswise", 1e-3, shard_all=shard_all,
        frozen_eps_indices=(0,), grad_accum_steps=2,
    )
    for _ in range(2):
        params3, o3, m3 = tp_step(params3, o3, jax.random.PRNGKey(2), x, y)

    np.testing.assert_allclose(float(m3["loss"]), float(m_ref["loss"]), rtol=1e-11)
    merged = merge_tp_params(params3, cfg)
    np.testing.assert_array_equal(
        np.asarray(merged["epses"][0]), np.asarray(params["epses"][0])
    )  # frozen core untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("shard_all", [False, True])
def test_tp_dropout_matches_single_device(shard_all):
    """Parameter dropout at p<1: masks are drawn with the single-device key
    chain over full core shapes (sharded cores slice their O-range), so the
    TP trajectory is BIT-identical to single-device — including the
    replicated early cores, which must see ONE consistent mask across model
    shards (a per-shard fold_in would mix n_model realizations)."""
    from dctn_tpu.parallel import (
        make_tp_mesh,
        make_tp_params,
        merge_tp_params,
        make_tp_train_step,
    )

    specs = ((2, 4), (2, 4)) if shard_all else ((2, 3), (2, 4))
    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=6, q0=2, dtype=jnp.float64, dropout_p=0.7
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 6, 6, 2), jnp.float64)
    y = jnp.asarray(np.arange(8) % 10)

    opt = make_optimizer("sgd", 0.05)
    step = make_train_step(cfg, opt, "epswise", 1e-3, donate=False)
    p_ref, o_ref = params, opt.init(params)
    for i in range(2):
        p_ref, o_ref, m_ref = step(p_ref, o_ref, jax.random.PRNGKey(7 + i), x, y)

    mesh = make_tp_mesh(2, 2)
    params3 = make_tp_params(params, cfg, mesh, shard_all)
    opt_tp = make_optimizer("sgd", 0.05)
    o3 = jax.jit(opt_tp.init)(params3)
    tp_step = make_tp_train_step(
        cfg, opt_tp, mesh, "epswise", 1e-3, shard_all=shard_all
    )
    for i in range(2):
        params3, o3, m3 = tp_step(params3, o3, jax.random.PRNGKey(7 + i), x, y)

    np.testing.assert_allclose(float(m3["loss"]), float(m_ref["loss"]), rtol=1e-11)
    merged = merge_tp_params(params3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-13)


def test_tp_three_channel_input_matches_single_device():
    """CIFAR-colored-style C=3 input through TP (the first core carries
    K²·C input dims; built by the empirical init which infers C from
    data)."""
    from dctn_tpu.parallel import make_tp_mesh, make_tp_params, make_tp_forward

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=6, q0=2, dtype=jnp.float64
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 8, 6, 6, 2), jnp.float64)
    params = init_eps_plus_linear(
        jax.random.PRNGKey(0), cfg, "unit_empirical_output_std", init_input=x
    )
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
    ref = eps_plus_linear_forward(params, x, cfg, training=False)

    mesh = make_tp_mesh(2, 2)
    params3 = make_tp_params(params, cfg, mesh)
    forward = make_tp_forward(cfg, mesh, params3)
    np.testing.assert_allclose(
        np.asarray(forward(params3, x)), np.asarray(ref), rtol=1e-12
    )


@pytest.mark.parametrize("n_eval", [8, 7, 5])  # divisible, ragged, < a batch
def test_tp_score_matches_single_device(n_eval):
    """make_tp_score_fn shards the split over the data axis (with padding
    for ragged sample counts) and must equal the single-device score."""
    from dctn_tpu.parallel import make_tp_mesh, make_tp_params
    from dctn_tpu.parallel.tensor_parallel import make_tp_score_fn
    from dctn_tpu.train.evaluation import make_score_fn

    cfg, params, x, y = _setup(dtype=jnp.float64, shard_all=True)
    x, y = x[:, :n_eval], y[:n_eval]
    ref = make_score_fn(cfg, batch_size=3)(params, x, y)

    mesh = make_tp_mesh(2, 2)
    params3 = make_tp_params(params, cfg, mesh, shard_all=True)
    got = make_tp_score_fn(cfg, mesh, 3, params3, shard_all=True)(params3, x, y)
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-12)
    assert float(got[1]) == float(ref[1])


def test_tp_step_with_pallas_backend():
    """TP with the fused Pallas kernels inside shard_map (the pod
    configuration when train_backend=auto resolves to pallas)."""
    from dctn_tpu.parallel import make_tp_mesh, make_tp_params, make_tp_train_step

    cfg_p = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        train_backend="pallas_interpret", dtype=jnp.float32,
    )
    cfg_x = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2, dtype=jnp.float32,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 6, 6, 2), jnp.float32)
    y = jnp.asarray(np.arange(8) % 10)
    mesh = make_tp_mesh(2, 2)
    results = {}
    for name, cfg in (("xla", cfg_x), ("pallas", cfg_p)):
        p3 = make_tp_params(params, cfg, mesh)
        opt = make_optimizer("sgd", 0.05)
        o3 = jax.jit(opt.init)(p3)
        step = make_tp_train_step(cfg, opt, mesh, "epswise", 1e-4)
        p3b, _, m = step(p3, o3, jax.random.PRNGKey(2), x, y)
        results[name] = (float(m["loss"]), p3b)
    assert results["xla"][0] == pytest.approx(results["pallas"][0], rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(results["xla"][1]),
        jax.tree_util.tree_leaves(results["pallas"][1]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_tp_fast_layout_step_matches_single_device_fast():
    """The FAST (cmt) parameter layout under TP (last-core row sharding —
    VERDICT r2 next-round #1): forward, 2-step Adam trajectory WITH dropout,
    and the TP-fast score must match the single-device fast path (the cmt
    matricization makes the model-axis shard a contiguous row block)."""
    from dctn_tpu.models.eps_plus_linear import (
        eps_plus_linear_forward_fast,
        fast_params_from_reference,
    )
    from dctn_tpu.parallel import (
        make_tp_mesh,
        make_tp_fast_params,
        merge_tp_fast_params,
        make_tp_fast_train_step,
        make_tp_fast_score_fn,
    )
    from dctn_tpu.train.step import make_fast_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        dropout_p=0.8, dtype=jnp.float32,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 6, 6, 2), jnp.float32)
    y = jnp.asarray(np.arange(8) % 10)
    fast, plans = fast_params_from_reference(params, cfg)
    mesh = make_tp_mesh(2, 2)
    fast3 = make_tp_fast_params(fast, cfg, mesh)

    # round trip
    merged0 = merge_tp_fast_params(fast3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(fast), jax.tree_util.tree_leaves(merged0)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    opt = make_optimizer("adam", 1e-2)
    step1 = make_fast_train_step(cfg, opt, plans, "epswise", 1e-4, donate=False)
    f1, o1 = fast, opt.init(fast)
    for i in range(2):
        f1, o1, m1 = step1(
            f1, o1, jax.random.fold_in(jax.random.PRNGKey(7), i), x, y
        )

    opt3 = make_optimizer("adam", 1e-2)
    step3 = make_tp_fast_train_step(cfg, opt3, plans, mesh, "epswise", 1e-4)
    f3, o3 = fast3, jax.jit(opt3.init)(fast3)
    for i in range(2):
        f3, o3, m3 = step3(
            f3, o3, jax.random.fold_in(jax.random.PRNGKey(7), i), x, y
        )
    np.testing.assert_allclose(float(m1["ce"]), float(m3["ce"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["reg_term"]), float(m3["reg_term"]), rtol=1e-5
    )
    merged = merge_tp_fast_params(f3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(f1), jax.tree_util.tree_leaves(merged)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)

    # TP-fast eval vs single-device fast eval
    from dctn_tpu.train import make_score_fn

    fwd = lambda f, xb: eps_plus_linear_forward_fast(  # noqa: E731
        f, xb, cfg, plans, training=False
    )
    score1 = make_score_fn(cfg, batch_size=4, forward_fn=fwd)
    mce1, acc1 = score1(f1, x, y)
    score3 = make_tp_fast_score_fn(cfg, plans, mesh, batch_size=2)
    mce3, acc3 = score3(f3, x, y)
    np.testing.assert_allclose(float(mce1), float(mce3), rtol=2e-4)
    np.testing.assert_allclose(float(acc1), float(acc3), rtol=1e-6)


def test_tp_fast_composition_reg_matches():
    """The composition regularizer under TP-fast (gather + unpermute +
    /n_model): value AND gradients match the single-device fast step."""
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
    from dctn_tpu.parallel import (
        make_tp_mesh,
        make_tp_fast_params,
        merge_tp_fast_params,
        make_tp_fast_train_step,
    )
    from dctn_tpu.train.step import make_fast_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        dtype=jnp.float32,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 6, 6, 2), jnp.float32)
    y = jnp.asarray(np.arange(8) % 10)
    fast, plans = fast_params_from_reference(params, cfg)
    mesh = make_tp_mesh(2, 2)
    opt = make_optimizer("sgd", 0.05)
    step1 = make_fast_train_step(
        cfg, opt, plans, "epses_composition", 1e-3, donate=False
    )
    f1, o1, m1 = step1(fast, opt.init(fast), jax.random.PRNGKey(2), x, y)
    fast3 = make_tp_fast_params(fast, cfg, mesh)
    step3 = make_tp_fast_train_step(
        cfg, opt, plans, mesh, "epses_composition", 1e-3
    )
    f3, _, m3 = step3(fast3, jax.jit(opt.init)(fast3), jax.random.PRNGKey(2), x, y)
    np.testing.assert_allclose(
        float(m1["reg_term"]), float(m3["reg_term"]), rtol=1e-5
    )
    merged = merge_tp_fast_params(f3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(f1), jax.tree_util.tree_leaves(merged)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
