"""Legacy ConvSBS MNIST model: architecture shapes, layer chaining, the
data-dependent rescaling invariant, quantum map semantics (strategy: the
reference's own runtime asserts, mnist.py:255-284)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.models.conv_sbs_model import (
    ConvSBSModelConfig,
    init_conv_sbs_model,
    conv_sbs_model_forward,
    scale_layers_using_batch,
    batch_to_quantum,
    calc_std_of_coordinates_of_windows,
    make_warmup_lr_schedule,
    SNAKE_ROW_MAJOR,
    SNAKE_COL_MAJOR,
)
from dctn_tpu.ops import sbs
from dctn_tpu.utils.pos2d import Pos2D


def test_snake_orders_cover_grid():
    for order in (SNAKE_ROW_MAJOR, SNAKE_COL_MAJOR):
        assert len(order) == 9
        assert set(order) == {Pos2D(h, w) for h in range(3) for w in range(3)}
        # consecutive positions are grid neighbors (it is a snake)
        for a, b in zip(order, order[1:]):
            assert abs(a.h - b.h) + abs(a.w - b.w) == 1


def test_layer_specs_structure():
    cfg = ConvSBSModelConfig(num_sbs_layers=3, bond_dim_size=4)
    specs = cfg.layer_specs()
    assert len(specs) == 3
    assert len(specs[0]) == 2 and specs[0][0].in_num_channels == 1
    assert len(specs[1]) == 2 and specs[1][0].in_num_channels == 2
    assert len(specs[2]) == 1 and specs[2][0].in_num_channels == 2
    assert specs[0][0].out_total_quantum_dim_size == 2
    assert specs[2][0].out_total_quantum_dim_size == 10


def test_quantum_map():
    x = jnp.asarray(np.array([[[0.0, 1.0]]]))
    q = batch_to_quantum(x, cos_sin_squared=False, multiplier=2.0)
    assert q.shape == (1, 1, 1, 2, 2)
    np.testing.assert_allclose(np.asarray(q[0, 0, 0, 0]), [0.0, 2.0], atol=1e-6)
    q2 = batch_to_quantum(x, cos_sin_squared=True, multiplier=1.0)
    np.testing.assert_allclose(
        np.asarray(q2[0, 0, 0, 1]),
        [np.sin(1.0) ** 2, np.cos(1.0) ** 2],
        rtol=1e-6,
    )


def test_forward_shapes(rng):
    cfg = ConvSBSModelConfig(num_sbs_layers=2, bond_dim_size=3)
    params = init_conv_sbs_model(rng, cfg, sbs.init_khrulkov_normal, jnp.float64)
    x = jax.random.uniform(rng, (2, 8, 8), jnp.float64)
    logits = conv_sbs_model_forward(params, cfg, x)
    assert logits.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_forward_three_layers(rng):
    cfg = ConvSBSModelConfig(num_sbs_layers=3, bond_dim_size=2, cos_sin_squared=True)
    params = init_conv_sbs_model(rng, cfg, sbs.init_khrulkov_normal, jnp.float64)
    x = jax.random.uniform(rng, (2, 10, 10), jnp.float64)
    logits = conv_sbs_model_forward(params, cfg, x)
    assert logits.shape == (2, 10)


def test_scale_layers_gives_unit_std(rng):
    cfg = ConvSBSModelConfig(num_sbs_layers=2, bond_dim_size=3)
    params = init_conv_sbs_model(rng, cfg, sbs.init_dumb_normal, jnp.float64, std=0.9)
    x = jax.random.uniform(rng, (8, 8, 8), jnp.float64)
    scaled = scale_layers_using_batch(params, cfg, x)
    # the reference asserts each layer's rescaled output has std ≈ 1
    quantum = batch_to_quantum(x, cfg.cos_sin_squared, cfg.input_multiplier)
    specs = cfg.layer_specs()
    intermediate = quantum
    for layer_spec, layer_params in zip(specs, scaled):
        outs = sbs.many_conv_sbs(layer_spec, layer_params, intermediate)
        for out in outs:
            # unbiased std like the reference's torch .std() (mnist.py:278)
            np.testing.assert_allclose(float(jnp.std(out, ddof=1)), 1.0, rtol=1e-6)
        intermediate = jnp.stack(outs, axis=0)


def test_window_std_statistic(rng):
    x = jax.random.uniform(rng, (4, 8, 8), jnp.float64)
    s1 = float(calc_std_of_coordinates_of_windows(x, 3, False, 1.0))
    s2 = float(calc_std_of_coordinates_of_windows(x, 3, False, 2.0))
    assert s1 > 0
    # multiplier m scales every window rank-one tensor by m^(K²·C)... each
    # COORDINATE of the rank-one tensor by m^(K²) here (9 factors of m)
    np.testing.assert_allclose(s2 / s1, 2.0**9, rtol=1e-6)


def test_warmup_schedule():
    # exponential warmup (mnist.py:489-499): lr·m^((W-epoch)/W)
    sched = make_warmup_lr_schedule(
        1e-3, 10, steps_per_epoch=1, warmup_initial_multiplier=1e-20
    )
    assert float(sched(0)) == pytest.approx(1e-3 * 1e-20, rel=1e-4)
    assert float(sched(5)) == pytest.approx(1e-3 * 1e-10, rel=1e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-3)
    # step→epoch mapping
    sched2 = make_warmup_lr_schedule(1e-3, 2, steps_per_epoch=5)
    assert float(sched2(4)) == float(sched2(0))  # still epoch 0
    assert float(sched2(10)) == pytest.approx(1e-3)  # epoch 2 → warm


def test_gradients_flow(rng):
    cfg = ConvSBSModelConfig(num_sbs_layers=2, bond_dim_size=2)
    params = init_conv_sbs_model(rng, cfg, sbs.init_khrulkov_normal, jnp.float64)
    x = jax.random.uniform(rng, (2, 8, 8), jnp.float64)
    y = jnp.asarray([1, 7])

    def loss(p):
        logits = conv_sbs_model_forward(p, cfg, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
