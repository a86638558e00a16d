"""Spatial parallelism (height-sharded EPS stack with per-layer halo
exchange) on the virtual mesh: forward / train-step / eval parity against
single-device training, composed with the data axis, on both the
reference-layout XLA path and the fast (cmt) Pallas pipeline."""

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
from dctn_tpu.parallel import (
    make_sp_mesh,
    make_sp_train_step,
    make_sp_fast_train_step,
    make_sp_forward,
    make_sp_score_fn,
    sp_shard_batch,
    sp_check_config,
    pad_rows,
)

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


@pytest.mark.parametrize("n_space", [1, 2, 4])
def test_sp_forward_matches_single_device(n_space):
    cfg, params, x, y = _setup()
    mesh = make_sp_mesh(1, n_space)
    xs = sp_shard_batch(mesh, x)
    forward = make_sp_forward(cfg, mesh)
    got = forward(params, xs)
    ref = eps_plus_linear_forward(params, x, cfg, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)


def test_sp_forward_k3_kernels():
    # K=3 needs a 2-row halo; image 7 over 2 space devices → Hl=4
    cfg, params, x, y = _setup(image_size=7, specs=((3, 3), (2, 4)))
    mesh = make_sp_mesh(1, 2)
    forward = make_sp_forward(cfg, mesh)
    got = forward(params, sp_shard_batch(mesh, x))
    ref = eps_plus_linear_forward(params, x, cfg, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)


@pytest.mark.parametrize("reg_type", ["epswise", "epses_composition"])
def test_sp_train_step_matches_single_device(reg_type):
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

    mesh = make_sp_mesh(1, 4)
    opt_sp = make_optimizer("sgd", lr)
    sp_step = make_sp_train_step(cfg, opt_sp, mesh, reg_type, reg_coeff)
    p_sp, o_sp = params, jax.jit(opt_sp.init)(params)
    xs = sp_shard_batch(mesh, x)
    losses_sp = []
    for _ in range(3):
        p_sp, o_sp, m = sp_step(p_sp, o_sp, rng, xs, y)
        losses_sp.append(float(m["loss"]))

    np.testing.assert_allclose(losses_sp, losses_ref, rtol=1e-12)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-14
        ),
        p_sp, p_ref,
    )


def test_sp_dp_composed_matches_single_device():
    # (2 data, 4 space): batch split in two, rows split in four
    cfg, params, x, y = _setup(n=8)
    lr = 0.05
    opt = make_optimizer("adam", lr)
    step = make_train_step(cfg, opt, reg_coeff=0.0, donate=False)
    p_ref, o_ref = params, opt.init(params)
    rng = jax.random.PRNGKey(3)
    for _ in range(2):
        p_ref, o_ref, m_ref = step(p_ref, o_ref, rng, x, y)

    mesh = make_sp_mesh(2, 4)
    opt_sp = make_optimizer("adam", lr)
    sp_step = make_sp_train_step(cfg, opt_sp, mesh)
    p_sp, o_sp = params, jax.jit(opt_sp.init)(params)
    xs, ys = sp_shard_batch(mesh, x, y)
    for _ in range(2):
        p_sp, o_sp, m_sp = sp_step(p_sp, o_sp, rng, xs, ys)

    # mean-of-shard-means == global mean (equal shard sizes)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-12)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        ),
        p_sp, p_ref,
    )


def test_sp_dropout_bit_identical_masks():
    # the replicated rng draws the single-device key chain on every shard
    cfg, params, x, y = _setup(dropout_p=0.7)
    lr = 0.1
    opt = make_optimizer("sgd", lr)
    step = make_train_step(cfg, opt, reg_coeff=0.0, donate=False)
    p_ref, o_ref = params, opt.init(params)
    mesh = make_sp_mesh(1, 4)
    opt_sp = make_optimizer("sgd", lr)
    sp_step = make_sp_train_step(cfg, opt_sp, mesh)
    p_sp, o_sp = params, jax.jit(opt_sp.init)(params)
    xs = sp_shard_batch(mesh, x)
    for i in range(2):
        rng = jax.random.PRNGKey(100 + i)
        p_ref, o_ref, _ = step(p_ref, o_ref, rng, x, y)
        p_sp, o_sp, _ = sp_step(p_sp, o_sp, rng, xs, y)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-14
        ),
        p_sp, p_ref,
    )


def test_sp_fast_layout_matches_single_device_fast():
    from dctn_tpu.models.eps_plus_linear import (
        fast_layer_plans,
        fast_params_from_reference,
    )
    from dctn_tpu.train.step import make_fast_train_step

    cfg, params, x, y = _setup(
        dtype=jnp.float32,
        train_backend="pallas_interpret",
        eval_backend="pallas_interpret",
    )
    fast, plans = fast_params_from_reference(params, cfg)
    lr = 0.05
    opt = make_optimizer("sgd", lr)
    step = make_fast_train_step(cfg, opt, plans, "epswise", 1e-3, donate=False)
    f_ref, o_ref = fast, opt.init(fast)
    rng = jax.random.PRNGKey(4)
    for _ in range(2):
        f_ref, o_ref, m_ref = step(f_ref, o_ref, rng, x, y)

    mesh = make_sp_mesh(2, 4)
    opt_sp = make_optimizer("sgd", lr)
    sp_step = make_sp_fast_train_step(cfg, opt_sp, plans, mesh, "epswise", 1e-3)
    f_sp, o_sp = fast, jax.jit(opt_sp.init)(fast)
    xs, ys = sp_shard_batch(mesh, x, y)
    for _ in range(2):
        f_sp, o_sp, m_sp = sp_step(f_sp, o_sp, rng, xs, ys)

    # f32 + different partial-sum grouping (per-shard matmuls then psum)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-6
        ),
        f_sp, f_ref,
    )


def test_sp_score_matches_single_device():
    from dctn_tpu.train.evaluation import make_score_fn

    cfg, params, x, y = _setup(n=11)
    ce_ref, acc_ref = make_score_fn(cfg, batch_size=4)(params, x, y)
    mesh = make_sp_mesh(2, 4)
    score = make_sp_score_fn(cfg, mesh, batch_size=4)
    xs = jax.device_put(pad_rows(np.asarray(x), 4))
    ce_sp, acc_sp = score(params, xs, y)
    np.testing.assert_allclose(float(ce_sp), float(ce_ref), rtol=1e-6)
    assert float(acc_sp) == pytest.approx(float(acc_ref))


def test_sp_halo_constraint_raises():
    cfg, *_ = _setup(specs=((4, 4),))
    # image 6 over 4 devices → Hl=2 < K-1=3
    with pytest.raises(ValueError, match="halo"):
        sp_check_config(cfg, 4)


def test_sp_grad_accum_matches():
    cfg, params, x, y = _setup()
    lr = 0.05
    mesh = make_sp_mesh(1, 2)
    xs = sp_shard_batch(mesh, x)
    rng = jax.random.PRNGKey(5)

    opt1 = make_optimizer("sgd", lr)
    s1 = make_sp_train_step(cfg, opt1, mesh)
    p1, o1 = params, jax.jit(opt1.init)(params)
    p1, o1, _ = s1(p1, o1, rng, xs, y)

    opt2 = make_optimizer("sgd", lr)
    s2 = make_sp_train_step(cfg, opt2, mesh, grad_accum_steps=2)
    p2, o2 = params, jax.jit(opt2.init)(params)
    p2, o2, _ = s2(p2, o2, rng, xs, y)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-14
        ),
        p2, p1,
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs the virtual mesh")
def test_sp_step_with_probs_matches_single_device():
    """VERDICT r3 #8: per-sample true-class probabilities flow through the
    SP step (and SP×TP), gathered over the data axis — equal to the
    single-device step's probs on the same global batch."""
    from dctn_tpu.parallel import make_sp_fast_train_step, make_sp_mesh, sp_shard_batch
    from dctn_tpu.train import make_optimizer
    from dctn_tpu.train.step import make_fast_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference

    fast, plans = fast_params_from_reference(params, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 6, 6, 2), jnp.float32)
    y = jnp.asarray(np.arange(8) % 10)
    opt = make_optimizer("sgd", 1e-2)

    step1 = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-6, donate=False, with_probs=True
    )
    _, _, m1 = step1(fast, opt.init(fast), jax.random.PRNGKey(7), x, y)

    mesh = make_sp_mesh(2, 2)
    step_sp = make_sp_fast_train_step(
        cfg, opt, plans, mesh, "epswise", 1e-6, with_probs=True
    )
    xs, ys = sp_shard_batch(mesh, x, y)
    _, _, msp = step_sp(
        fast, jax.jit(opt.init)(fast), jax.random.PRNGKey(7), xs, ys
    )
    p1 = np.asarray(m1["probs_of_true_class"])
    psp = np.asarray(msp["probs_of_true_class"])
    assert psp.shape == (8,)
    np.testing.assert_allclose(psp, p1, rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the virtual mesh")
def test_sp_tp_step_with_probs_matches_single_device():
    from dctn_tpu.parallel import make_tp_fast_params
    from dctn_tpu.parallel.sp_tp import (
        make_sp_tp_fast_train_step,
        make_sp_tp_mesh,
        sp_tp_shard_batch,
    )
    from dctn_tpu.train import make_optimizer
    from dctn_tpu.train.step import make_fast_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference

    fast, plans = fast_params_from_reference(params, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 6, 6, 2), jnp.float32)
    y = jnp.asarray(np.arange(8) % 10)
    opt = make_optimizer("sgd", 1e-2)
    step1 = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-6, donate=False, with_probs=True
    )
    _, _, m1 = step1(fast, opt.init(fast), jax.random.PRNGKey(7), x, y)

    mesh = make_sp_tp_mesh(2, 2, 2)
    fast3 = make_tp_fast_params(fast, cfg, mesh)
    step3 = make_sp_tp_fast_train_step(
        cfg, opt, plans, mesh, "epswise", 1e-6, with_probs=True
    )
    xs, ys = sp_tp_shard_batch(mesh, x, y)
    _, _, m3 = step3(
        fast3, jax.jit(opt.init)(fast3), jax.random.PRNGKey(7), xs, ys
    )
    np.testing.assert_allclose(
        np.asarray(m3["probs_of_true_class"]),
        np.asarray(m1["probs_of_true_class"]),
        rtol=1e-6,
    )
