"""EPSesPlusLinear model: init families, parameter dropout semantics,
regularizers, forward correctness (strategy: reference
tests/test_eps_plus_linear.py statistical bounds + composition parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.models import (
    EPSesPlusLinearConfig,
    init_eps_plus_linear,
    eps_plus_linear_forward,
    epswise_l2_regularizer,
    epses_composition_l2_regularizer,
    intermediate_reps_stats,
)
from dctn_tpu.ops import composition, eps as eps_mod
from dctn_tpu.utils.misc import ZeroCenteredNormalInit, ZeroCenteredUniformInit

CFG = EPSesPlusLinearConfig(epses_specs=((2, 3), (2, 4)), image_size=6, q0=2)


def test_init_shapes(rng):
    params = init_eps_plus_linear(rng, CFG)
    assert params["epses"][0].shape == (2, 2, 2, 2, 3)
    assert params["epses"][1].shape == (3, 3, 3, 3, 4)
    assert CFG.pre_linear_image_size == 4
    assert params["linear"]["w"].shape == (4 * 4 * 4, 10)
    assert params["linear"]["b"].shape == (10,)


def test_default_linear_init_ranges(rng):
    cfg = EPSesPlusLinearConfig(epses_specs=((4, 4),), image_size=28)
    params = init_eps_plus_linear(rng, cfg)
    n_in = cfg.linear_in_features
    w = np.asarray(params["linear"]["w"])
    b = np.asarray(params["linear"]["b"])
    expected_w_std = n_in**-0.5 / 4
    assert abs(w.std() - expected_w_std) / expected_w_std < 0.05
    assert np.all(np.abs(b) <= n_in**-0.5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_manual_init_ranges(rng, dtype):
    cfg = EPSesPlusLinearConfig(epses_specs=((2, 3), (2, 4)), image_size=6, dtype=dtype)
    params = init_eps_plus_linear(
        rng,
        cfg,
        "manual",
        eps_inits=(ZeroCenteredNormalInit(4e-2), ZeroCenteredUniformInit(0.3)),
        linear_weight_init=ZeroCenteredNormalInit(1e-2),
        linear_bias_init=ZeroCenteredUniformInit(0.1),
    )
    e0 = np.asarray(params["epses"][0])
    e1 = np.asarray(params["epses"][1])
    assert abs(e0.std() - 4e-2) / 4e-2 < 0.3
    assert np.all(np.abs(e1) <= 0.3) and e1.std() > 0.3 / 4
    assert np.all(np.abs(np.asarray(params["linear"]["b"])) <= 0.1)
    assert params["epses"][0].dtype == dtype


def test_forward_matches_composition(rng):
    params = init_eps_plus_linear(rng, CFG)
    x = jax.random.uniform(jax.random.split(rng)[0], (1, 3, 6, 6, 2), jnp.float32)
    logits = eps_plus_linear_forward(params, x, CFG)
    inter = composition.contract_with_input(params["epses"], x)
    flat = inter.reshape(3, -1)
    expected = flat @ params["linear"]["w"] + params["linear"]["b"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(expected), rtol=1e-6)
    assert logits.shape == (3, 10)


def test_dropout_semantics(rng):
    cfg_drop = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, dropout_p=0.7
    )
    params = init_eps_plus_linear(rng, cfg_drop)
    x = jax.random.uniform(jax.random.split(rng)[1], (1, 3, 6, 6, 2), jnp.float32)
    eval_out = eps_plus_linear_forward(params, x, cfg_drop, training=False)
    # eval ignores dropout → deterministic, equals the p=1 config's output
    np.testing.assert_allclose(
        np.asarray(eval_out),
        np.asarray(eps_plus_linear_forward(params, x, CFG, training=False)),
    )
    k1, k2 = jax.random.split(rng)
    t1 = eps_plus_linear_forward(params, x, cfg_drop, training=True, rng=k1)
    t2 = eps_plus_linear_forward(params, x, cfg_drop, training=True, rng=k2)
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # same key → same masks → identical output
    t1b = eps_plus_linear_forward(params, x, cfg_drop, training=True, rng=k1)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t1b))
    # masked cores are unbiased: E[mask·core/p] = core (check the mean over keys)
    core = params["epses"][0]
    masked = [
        np.asarray(
            core
            * jax.random.bernoulli(jax.random.fold_in(rng, i), 0.7, core.shape) / 0.7
        )
        for i in range(400)
    ]
    np.testing.assert_allclose(
        np.mean(masked, axis=0), np.asarray(core), atol=0.12 * float(jnp.abs(core).max())
    )


def test_regularizers(rng):
    params = init_eps_plus_linear(rng, CFG)
    epswise = float(epswise_l2_regularizer(params))
    expected = float(
        jnp.sum(params["linear"]["w"] ** 2)
        + sum(jnp.sum(c**2) for c in params["epses"])
    )
    np.testing.assert_allclose(epswise, expected, rtol=1e-6)
    comp = float(epses_composition_l2_regularizer(params))
    expected_comp = float(
        jnp.sum(params["linear"]["w"] ** 2)
        + composition.inner_product(params["epses"], params["epses"])
    )
    np.testing.assert_allclose(comp, expected_comp, rtol=1e-6)


def test_empirical_init_through_model(rng):
    x = jax.random.uniform(jax.random.split(rng)[0], (1, 64, 6, 6, 2), jnp.float32) * 1.4
    params = init_eps_plus_linear(
        rng, CFG, "unit_empirical_output_std", init_input=x, init_batch_size=16
    )
    mid = eps_mod.eps(params["epses"][0], x)
    assert abs(float(jnp.std(mid)) - 1.0) < 1e-3
    out = eps_mod.eps(params["epses"][1], mid[None])
    assert abs(float(jnp.std(out)) - 1.0) < 1e-3


def test_intermediate_reps_stats(rng):
    params = init_eps_plus_linear(rng, CFG)
    x = jax.random.uniform(jax.random.split(rng)[0], (1, 16, 6, 6, 2), jnp.float32)
    stats = intermediate_reps_stats(params, x, CFG, batch_size=8)
    assert set(stats) == {
        "x_0", "w_0", "x_1", "w_1", "x_2",
        "output_of_linear_without_bias", "output_of_linear_with_bias",
    }
    np.testing.assert_allclose(stats["x_0"]["mean"], float(jnp.mean(x)), rtol=1e-5)
