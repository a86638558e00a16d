"""int8 (W8A8) quantized serving forward: quantizer bounds, kernel-vs-oracle
exactness (interpret mode), and whole-model logit error against the f32 fast
pipeline. A TPU-native deployment capability with no reference analog — the
reference's story ends at training scripts (see cli/export.py); these tests
pin the quantization math the exported int8 artifacts bake in."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.models.eps_plus_linear import (
    eps_plus_linear_forward_fast,
    fast_layer_plans,
    fast_params_from_reference,
)
from dctn_tpu.pallas.eps_pallas import (
    _kernel_dims,
    _stack_views_from_xT,
    _suffix_chain,
)
from dctn_tpu.pallas.eps_pallas_q8 import (
    _quantize_columns,
    eps_pallas_apply_t_q8,
    forward_fast_q8,
    plan_q8_bn,
    quantize_cmt,
    quantize_fast_params,
)


def test_quantize_cmt_error_bound(rng):
    """Dequantized weights differ from the original by at most half a
    quantization step per element (symmetric round-to-nearest)."""
    cmt = jax.random.normal(rng, (24, 64), jnp.float32) * 3.0
    wq, sw = quantize_cmt(cmt)
    assert wq.dtype == jnp.int8 and sw.shape == (24, 1)
    deq = np.asarray(wq, np.float32) * np.asarray(sw)
    step = np.asarray(sw)
    assert np.all(np.abs(deq - np.asarray(cmt)) <= step / 2 + 1e-7)
    # rows hit the full int8 range
    assert np.asarray(jnp.abs(wq)).max(axis=1).min() == 127


def test_quantize_cmt_zero_row(rng):
    """An all-zero row must quantize to zeros with a positive scale (the
    padded-pixel guard), not divide by zero."""
    cmt = jnp.zeros((8, 16), jnp.float32)
    wq, sw = quantize_cmt(cmt)
    assert np.all(np.asarray(wq) == 0)
    assert np.all(np.asarray(sw) > 0)


def _q8_oracle(views_t, wq, sw, n1, out_size, npix):
    """Plain-jnp replica of the q8 kernel math over the whole (unpadded)
    pixel axis: same chain order, same round/clip ops, exact int32 matmul."""
    n, q, npad = views_t.shape
    u = _suffix_chain(views_t, 0, n1)[0]
    uq, su = _quantize_columns(u)
    t = (
        jax.lax.dot_general(
            wq, uq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        * sw
        * su
    )
    n2 = n - n1
    if n2 > 0:
        v = _suffix_chain(views_t, n1, n)[0]
        t3 = t.reshape(out_size, q**n2, npad)
        out = jnp.einsum("oan,an->on", t3, v)
    else:
        out = t
    return out[:, :npix]


@pytest.mark.parametrize(
    "C,K,Q,O,H,W,B",
    [
        (1, 2, 2, 3, 4, 4, 2),
        (1, 3, 2, 4, 6, 5, 3),
        (2, 2, 2, 3, 4, 4, 2),
        (1, 2, 3, 5, 5, 5, 2),
    ],
)
def test_q8_kernel_matches_oracle(rng, C, K, Q, O, H, W, B):
    from dctn_tpu.ops import eps as E
    from dctn_tpu.pallas.eps_pallas import plan_pallas_call

    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float32)
    x = jax.random.normal(k2, (C, B, H, W, Q), jnp.float32)
    hp, wp = H - K + 1, W - K + 1
    npix = B * hp * wp
    n = K * K * C
    n1 = E._balanced_split(n, Q, O)
    n1, _bn, merge_pairs, _mm = plan_pallas_call(
        C, Q, K, n1, O, npix, None, True
    )
    n_k, q_k, n1_k = _kernel_dims(C, Q, K, n1, merge_pairs)
    from dctn_tpu.pallas.eps_pallas import _core_to_cmt_k

    wq, sw = quantize_cmt(_core_to_cmt_k(core, n1_k, q_k))
    bn = plan_q8_bn(n_k, n1_k, q_k, O, max(128, -(-npix // 128) * 128))
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    got = eps_pallas_apply_t_q8(
        wq, sw, xT, O, K, n1, bn, True, merge_pairs
    )
    views_t, npix2 = _stack_views_from_xT(xT, K, bn, merge_pairs)
    assert npix2 == npix
    want = _q8_oracle(views_t, wq, sw, n1_k, O, npix).reshape(O, hp, wp, B)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_q8_forward_close_to_f32(rng):
    """Whole-model W8A8 logits track the f32 fast pipeline within a few
    percent relative L2 — the end-to-end quantization-noise budget the
    int8 artifacts ship with."""
    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4), (2, 6)),
        image_size=8,
        q0=2,
        train_backend="pallas_interpret",
        eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(rng, cfg)
    fast, plans = fast_params_from_reference(params, cfg)
    qparams = quantize_fast_params(fast, plans)
    for wq in qparams["epses_q"]:
        assert wq.dtype == jnp.int8
    x = jax.random.uniform(
        jax.random.fold_in(rng, 7), (1, 16, 8, 8, 2), jnp.float32, 0.0, 2.0
    )
    ref = np.asarray(
        eps_plus_linear_forward_fast(fast, x, cfg, plans, training=False)
    )
    got = np.asarray(forward_fast_q8(qparams, x, cfg, plans, interpret=True))
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-30)
    assert rel < 0.05, rel
    # logits stay finite and the same shape
    assert got.shape == ref.shape and np.all(np.isfinite(got))


def test_q8_plan_exists_for_recorded_configs():
    """Every recorded reference config's layers get a q8 tile plan (the
    serving path never silently loses a layer to VMEM)."""
    from dctn_tpu.ops import eps as E
    from dctn_tpu.pallas.eps_pallas import plan_pallas_call

    for specs, q0, c in [
        (((4, 4), (3, 6)), 2, 1),  # two-EPS FashionMNIST flagship
        (((4, 4), (3, 12), (2, 24)), 2, 1),  # deep three-EPS family
        (((2, 24),), 2, 3),  # CIFAR YCbCr K=2 Q=24
    ]:
        cfg = EPSesPlusLinearConfig(
            epses_specs=specs, q0=q0, train_backend="pallas_interpret",
            eval_backend="pallas_interpret",
        )
        ch, q = c, q0
        for k, o in specs:
            n = k * k * ch
            n1 = E._balanced_split(n, q, o)
            n1, _bn, merge_pairs, _ = plan_pallas_call(
                ch, q, k, n1, o, 128 * 128, None, True
            )
            n_k, q_k, n1_k = _kernel_dims(ch, q, k, n1, merge_pairs)
            assert plan_q8_bn(n_k, n1_k, q_k, o, 4096) is not None, (specs, k, o)
            ch, q = 1, o


# ---------------------------------------------------------------------------
# QAT: int8 forward for TRAINING with straight-through gradients


def _q8train_plan(C, K, Q, O, H, W, B):
    from dctn_tpu.ops import eps as E
    from dctn_tpu.pallas.eps_pallas import _save_t_plan, plan_pallas_call
    from dctn_tpu.pallas.eps_pallas_q8 import plan_q8_train_bn

    hp, wp = H - K + 1, W - K + 1
    npix = B * hp * wp
    n = K * K * C
    n1 = E._balanced_split(n, Q, O)
    n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
        C, Q, K, n1, O, npix, None, True
    )
    n_k, q_k, n1_k = _kernel_dims(C, Q, K, n1, merge_pairs)
    npad = -(-npix // bn) * bn
    save = _save_t_plan(n_k, n1_k, q_k, O, bn, mm_dtype, npad, False)
    bn_q8 = plan_q8_train_bn(
        n_k, n1_k, q_k, O, max(128, -(-npix // 128) * 128),
        save is not None, jnp.dtype(mm_dtype).itemsize,
    )
    return n1, bn, bn_q8, merge_pairs, mm_dtype, n_k, q_k, n1_k, npix, save


def test_q8train_forward_matches_serving_kernel(rng):
    """The QAT op's forward IS the W8A8 serving math: bit-identical to the
    serving kernel run on quantize_cmt of the same live f32 cmt (the
    per-column activation quantizer is tile-size-invariant)."""
    from dctn_tpu.ops import eps as E
    from dctn_tpu.pallas.eps_pallas import _core_to_cmt_k
    from dctn_tpu.pallas.eps_pallas_q8 import eps_pallas_apply_t_cmt_q8train

    C, K, Q, O, H, W, B = 1, 2, 3, 5, 5, 5, 2
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float32)
    x = jax.random.normal(k2, (C, B, H, W, Q), jnp.float32)
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    n1, bn, bn_q8, merge_pairs, mm_dtype, n_k, q_k, n1_k, npix, _s = (
        _q8train_plan(C, K, Q, O, H, W, B)
    )
    cmt = _core_to_cmt_k(core, n1_k, q_k)
    got = eps_pallas_apply_t_cmt_q8train(
        cmt, xT, O, K, n1, bn, bn_q8, True, mm_dtype, merge_pairs, False,
        _s is not None,
    )
    wq, sw = quantize_cmt(cmt)
    want = eps_pallas_apply_t_q8(
        wq, sw, xT, O, K, n1, bn_q8, True, merge_pairs
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_q8train_ste_gradients_match_f32_backward(rng):
    """Straight-through: with the same upstream cotangent, the QAT op's
    gradients equal the f32 op's exactly when no saved-t plan fires (tiny
    a) — the backward literally runs the same f32 kernels on the same
    residuals, blind to the quantization."""
    from dctn_tpu.ops import eps as E
    from dctn_tpu.pallas.eps_pallas import (
        _core_to_cmt_k,
        eps_pallas_apply_t_cmt,
    )
    from dctn_tpu.pallas.eps_pallas_q8 import eps_pallas_apply_t_cmt_q8train

    C, K, Q, O, H, W, B = 1, 2, 3, 5, 5, 5, 2
    k1, k2, k3 = jax.random.split(rng, 3)
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float32)
    x = jax.random.normal(k2, (C, B, H, W, Q), jnp.float32)
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    n1, bn, bn_q8, merge_pairs, mm_dtype, n_k, q_k, n1_k, npix, save = (
        _q8train_plan(C, K, Q, O, H, W, B)
    )
    assert save is None  # tiny a: the no-saved-t arm
    cmt = _core_to_cmt_k(core, n1_k, q_k)
    hp, wp = H - K + 1, W - K + 1
    wgt = jax.random.normal(k3, (O, hp, wp, B), jnp.float32)

    def loss_q(c, xt):
        out = eps_pallas_apply_t_cmt_q8train(
            c, xt, O, K, n1, bn, bn_q8, True, mm_dtype, merge_pairs, False,
            False,
        )
        return jnp.sum(out * wgt)

    def loss_f(c, xt):
        out = eps_pallas_apply_t_cmt(
            c, xt, O, K, n1, bn, True, mm_dtype, merge_pairs, False
        )
        return jnp.sum(out * wgt)

    gq = jax.grad(loss_q, argnums=(0, 1))(cmt, xT)
    gf = jax.grad(loss_f, argnums=(0, 1))(cmt, xT)
    for a, b in zip(gq, gf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_q8train_saved_t_gradients_match_ste_oracle(rng, monkeypatch):
    """Force the saved-t plan at tiny a (SAVE_T_MIN_A=1): the activation
    cotangent's v-half flows through the QUANTIZED t the forward produced.
    Oracle: jax.grad of contract(t_f32, sg(v)) + contract(sg(t_q), v) with
    the views built by the same (differentiable) jnp stacking."""
    import dctn_tpu.pallas.eps_pallas as ep
    from dctn_tpu.ops import eps as E
    from dctn_tpu.pallas.eps_pallas import _core_to_cmt_k
    from dctn_tpu.pallas.eps_pallas_q8 import eps_pallas_apply_t_cmt_q8train

    monkeypatch.setenv("DCTN_TPU_SAVE_T_MIN_A", "1")
    C, K, Q, O, H, W, B = 1, 2, 3, 5, 5, 5, 2
    k1, k2, k3 = jax.random.split(rng, 3)
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float32)
    x = jax.random.normal(k2, (C, B, H, W, Q), jnp.float32)
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    n1, bn, bn_q8, merge_pairs, mm_dtype, n_k, q_k, n1_k, npix, save = (
        _q8train_plan(C, K, Q, O, H, W, B)
    )
    assert save is not None  # the saved-t arm is what we're testing
    cmt = _core_to_cmt_k(core, n1_k, q_k)
    hp, wp = H - K + 1, W - K + 1
    wgt = jax.random.normal(k3, (O, hp, wp, B), jnp.float32)

    def loss_q(c, xt):
        out = eps_pallas_apply_t_cmt_q8train(
            c, xt, O, K, n1, bn, bn_q8, True, mm_dtype, merge_pairs, False,
            True,
        )
        return jnp.sum(out * wgt)

    def loss_oracle(c, xt):
        views, npix2 = _stack_views_from_xT(xt, K, bn, merge_pairs)
        u = _suffix_chain(views, 0, n1_k)[0]
        v = _suffix_chain(views, n1_k, n_k)[0]
        t_f = jax.lax.dot_general(
            c, u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wq, sw = quantize_cmt(c)
        uq, su = _quantize_columns(u)
        t_q = jax.lax.stop_gradient(
            jax.lax.dot_general(
                wq, uq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            * sw
            * su
        )
        n2 = n_k - n1_k
        npad = views.shape[-1]

        def contract(t, vv):
            t3 = t.reshape(O, q_k**n2, npad)
            return jnp.einsum("oan,an->on", t3, vv)

        out = contract(t_f, jax.lax.stop_gradient(v)) + contract(t_q, v)
        out = out[:, :npix2].reshape(O, hp, wp, B)
        return jnp.sum(out * wgt)

    gq = jax.grad(loss_q, argnums=(0, 1))(cmt, xT)
    go = jax.grad(loss_oracle, argnums=(0, 1))(cmt, xT)
    for a, b in zip(gq, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_fast_train_step_qat_learns():
    """make_fast_train_step(qat="int8") end to end: the quantized-forward
    step trains (loss decreases) and composes with parameter dropout."""
    from dctn_tpu.train import make_optimizer
    from dctn_tpu.train.step import make_fast_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4), (2, 4)),
        image_size=8,
        q0=2,
        train_backend="pallas_interpret",
        eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(3), cfg)
    fast, plans = fast_params_from_reference(params, cfg)
    opt = make_optimizer("adam", 3e-3)
    step = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-6, donate=False, qat="int8"
    )
    opt_state = opt.init(fast)
    x = (
        jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 8, 8, 2))
        .astype(jnp.float32)
        * 1.4
    )
    y = jnp.asarray(np.arange(32) % 10)
    losses = []
    for i in range(25):
        fast, opt_state, m = step(
            fast, opt_state, jax.random.PRNGKey(100 + i), x, y
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]

    # dropout composes (p < 1 draws masks before quantization)
    import dataclasses

    cfg_d = dataclasses.replace(cfg, dropout_p=0.8)
    step_d = make_fast_train_step(
        cfg_d, opt, plans, "epswise", 1e-6, donate=False, qat="int8"
    )
    fast2, _ = fast_params_from_reference(params, cfg_d)
    f3, os3, m3 = step_d(
        fast2, opt.init(fast2), jax.random.PRNGKey(9), x, y
    )
    assert np.isfinite(float(m3["loss"]))

    with pytest.raises(ValueError, match="unsupported qat"):
        make_fast_train_step(cfg, opt, plans, qat="int4")


# ---------------------------------------------------------------------------
# QAT × model parallelism: the W8A8 quantizers are shard-local (weights
# per-ROW — a TP shard's contiguous cmt row block quantizes exactly like the
# corresponding rows of the full core; activations per-pixel-COLUMN — an SP
# shard's local pixel columns carry single-device values), so QAT composes
# with --model-devices / --space-devices without changing numerics.


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs the virtual mesh")
def test_tp_fast_qat_matches_single_device():
    """make_tp_fast_train_step(qat="int8") on a (2 data, 2 model) mesh:
    2 Adam steps WITH dropout and the quantized-forward score must match the
    single-device QAT step (per-row weight quantization makes the sharded
    last core's row block exact)."""
    from dctn_tpu.parallel import (
        make_tp_fast_params,
        make_tp_fast_score_fn,
        make_tp_fast_train_step,
        make_tp_mesh,
        merge_tp_fast_params,
    )
    from dctn_tpu.pallas.eps_pallas_q8 import forward_fast_q8train
    from dctn_tpu.train import make_optimizer, make_score_fn
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

    opt = make_optimizer("adam", 1e-2)
    step1 = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-4, donate=False, qat="int8"
    )
    f1, o1 = fast, opt.init(fast)
    for i in range(2):
        f1, o1, m1 = step1(
            f1, o1, jax.random.fold_in(jax.random.PRNGKey(7), i), x, y
        )

    mesh = make_tp_mesh(2, 2)
    fast3 = make_tp_fast_params(fast, cfg, mesh)
    opt3 = make_optimizer("adam", 1e-2)
    step3 = make_tp_fast_train_step(
        cfg, opt3, plans, mesh, "epswise", 1e-4, qat="int8"
    )
    f3, o3 = fast3, jax.jit(opt3.init)(fast3)
    for i in range(2):
        f3, o3, m3 = step3(
            f3, o3, jax.random.fold_in(jax.random.PRNGKey(7), i), x, y
        )
    np.testing.assert_allclose(float(m1["ce"]), float(m3["ce"]), rtol=1e-5)
    merged = merge_tp_fast_params(f3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(f1), jax.tree_util.tree_leaves(merged)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )

    # TP eval through the QUANTIZED forward (the runner's eval under --qat)
    fwd = lambda f, xb: forward_fast_q8train(  # noqa: E731
        f, xb, cfg, plans, training=False
    )
    score1 = make_score_fn(cfg, batch_size=4, forward_fn=fwd)
    mce1, acc1 = score1(f1, x, y)
    score3 = make_tp_fast_score_fn(cfg, plans, mesh, batch_size=2, qat="int8")
    mce3, acc3 = score3(f3, x, y)
    np.testing.assert_allclose(float(mce1), float(mce3), rtol=2e-4)
    np.testing.assert_allclose(float(acc1), float(acc3), rtol=1e-6)

    with pytest.raises(ValueError, match="unsupported qat"):
        make_tp_fast_train_step(cfg, opt3, plans, mesh, qat="int4")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the virtual mesh")
def test_sp_fast_qat_matches_single_device():
    """make_sp_fast_train_step(qat="int8") on a (2 data, 4 space) mesh:
    2 SGD steps + the quantized-forward score vs single-device QAT
    (per-pixel-column activation quantization is local to each row shard)."""
    from dctn_tpu.parallel import (
        make_sp_fast_train_step,
        make_sp_mesh,
        make_sp_score_fn,
        pad_rows,
        sp_shard_batch,
    )
    from dctn_tpu.pallas.eps_pallas_q8 import forward_fast_q8train
    from dctn_tpu.train import make_optimizer, make_score_fn
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

    opt = make_optimizer("sgd", 0.05)
    step1 = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-3, donate=False, qat="int8"
    )
    f1, o1 = fast, opt.init(fast)
    rng = jax.random.PRNGKey(4)
    for _ in range(2):
        f1, o1, m1 = step1(f1, o1, rng, x, y)

    mesh = make_sp_mesh(2, 4)
    opt_sp = make_optimizer("sgd", 0.05)
    sp_step = make_sp_fast_train_step(
        cfg, opt_sp, plans, mesh, "epswise", 1e-3, qat="int8"
    )
    f_sp, o_sp = fast, jax.jit(opt_sp.init)(fast)
    xs, ys = sp_shard_batch(mesh, x, y)
    for _ in range(2):
        f_sp, o_sp, m_sp = sp_step(f_sp, o_sp, rng, xs, ys)
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m1["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(f1), jax.tree_util.tree_leaves(f_sp)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )

    fwd = lambda f, xb: forward_fast_q8train(  # noqa: E731
        f, xb, cfg, plans, training=False
    )
    mce1, acc1 = make_score_fn(cfg, batch_size=4, forward_fn=fwd)(f1, x, y)
    score_sp = make_sp_score_fn(cfg, mesh, 4, plans, qat="int8")
    mce_sp, acc_sp = score_sp(
        f_sp, jax.device_put(pad_rows(np.asarray(x), 4)), y
    )
    np.testing.assert_allclose(float(mce_sp), float(mce1), rtol=2e-4)
    np.testing.assert_allclose(float(acc_sp), float(acc1), rtol=1e-6)

    with pytest.raises(ValueError, match="unsupported qat"):
        make_sp_fast_train_step(cfg, opt_sp, plans, mesh, qat="int4")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the virtual mesh")
def test_sp_tp_fast_qat_matches_single_device():
    """QAT on the full composed (2 data, 2 space, 2 model) mesh: 2 Adam
    steps WITH dropout + the quantized score vs single-device QAT — every
    mesh axis the EPS family supports runs the W8A8 STE pipeline."""
    from dctn_tpu.parallel import (
        make_sp_tp_fast_train_step,
        make_sp_tp_mesh,
        make_sp_tp_score_fn,
        make_tp_fast_params,
        merge_tp_fast_params,
        sp_tp_shard_batch,
    )
    from dctn_tpu.pallas.eps_pallas_q8 import forward_fast_q8train
    from dctn_tpu.train import make_optimizer, make_score_fn
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

    opt = make_optimizer("adam", 1e-2)
    step1 = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-4, donate=False, qat="int8"
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
        cfg, opt3, plans, mesh, "epswise", 1e-4, qat="int8"
    )
    f3, o3 = fast3, jax.jit(opt3.init)(fast3)
    xs, ys = sp_tp_shard_batch(mesh, x, y)
    for i in range(2):
        f3, o3, m3 = step3(
            f3, o3, jax.random.fold_in(jax.random.PRNGKey(7), i), xs, ys
        )
    np.testing.assert_allclose(float(m1["ce"]), float(m3["ce"]), rtol=1e-5)
    merged = merge_tp_fast_params(f3, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(f1), jax.tree_util.tree_leaves(merged)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )

    fwd = lambda f, xb: forward_fast_q8train(  # noqa: E731
        f, xb, cfg, plans, training=False
    )
    mce1, acc1 = make_score_fn(cfg, batch_size=4, forward_fn=fwd)(f1, x, y)
    score3 = make_sp_tp_score_fn(
        cfg, mesh, batch_size=2, params3=f3, fast_plans=plans, qat="int8"
    )
    mce3, acc3 = score3(f3, sp_tp_shard_batch(mesh, x), y)
    np.testing.assert_allclose(float(mce1), float(mce3), rtol=2e-4)
    np.testing.assert_allclose(float(acc1), float(acc3), rtol=1e-6)


# ---------------------------------------------------------------------------
# saved-t STE decision near the HBM cap: sharded QAT must pick the SAME
# backward variant as the single-device run on the global batch (the decision
# keys on out_size·npix, so shard-local shapes could otherwise flip it —
# ADVICE r3; fixed by qat_save_decision on global shapes)


def test_qat_saved_t_decision_is_global_near_cap(rng, monkeypatch):
    """Pin DCTN_TPU_SAVE_T_MAX_BYTES between the HALF-batch and FULL-batch
    t-buffer footprints (MIN_A=1 so the threshold is live at tiny a): the
    full batch must NOT save t while a half batch in isolation WOULD. A DP
    shard seeing half the batch must follow the GLOBAL decision
    (pixel_scale=2) — its gradients then sum exactly to the single-device
    full-batch gradients. Without the global decision the shard's backward
    flows through the saved DEQUANTIZED t while single-device recomputes
    f32 t — measurably different gradients (asserted below as the
    regression's signature)."""
    from dctn_tpu.pallas.eps_pallas import plan_pallas_call
    from dctn_tpu.pallas.eps_pallas_q8 import (
        forward_fast_q8train,
        qat_save_decision,
    )

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)),
        image_size=6,
        q0=2,
        train_backend="pallas_interpret",
        eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    fast, plans = fast_params_from_reference(params, cfg)
    B = 32
    x = jax.random.uniform(rng, (1, B, 6, 6, 2), jnp.float32)

    # layer 1 (not first → saved-t eligible): compute its full/half-batch
    # t-buffer bytes and pin the cap strictly between them
    p1 = plans[1]
    k_, o1 = p1["kernel_size"], p1["out_size"]
    hp = 6 - plans[0]["kernel_size"] + 1 - k_ + 1  # 4
    npix_full, npix_half = B * hp * hp, (B // 2) * hp * hp
    c1, q1 = 1, plans[0]["out_size"]

    def t_buffer_bytes(npix):
        # the footprint qat_save_decision tests against the cap, with the
        # bn the decision itself derives at this pixel count
        n1r, bn, merge_pairs, mm_dtype = plan_pallas_call(
            c1, q1, k_, p1["n1"], o1, npix, None, True
        )
        n_k, q_k, n1_k = _kernel_dims(c1, q1, k_, n1r, merge_pairs)
        z = o1 * q_k ** (n_k - n1_k)
        npad = -(-npix // max(bn, 128)) * max(bn, 128)
        return z * npad * jnp.dtype(mm_dtype).itemsize

    bytes_full, bytes_half = t_buffer_bytes(npix_full), t_buffer_bytes(npix_half)
    assert bytes_half < bytes_full, "shapes too small to separate the cap"
    cap = (bytes_half + bytes_full) // 2
    monkeypatch.setenv("DCTN_TPU_SAVE_T_MIN_A", "1")
    monkeypatch.setenv("DCTN_TPU_SAVE_T_MAX_BYTES", str(cap))

    # premise: the decision genuinely flips between local and global shapes
    assert not qat_save_decision(
        c1, q1, k_, p1["n1"], o1, npix_full, None, True, False
    )
    assert qat_save_decision(
        c1, q1, k_, p1["n1"], o1, npix_half, None, True, False
    )

    wgt = jax.random.normal(jax.random.PRNGKey(5), (B, cfg.num_classes))
    half = B // 2

    def loss(f, xb, w, scale):
        return jnp.sum(
            forward_fast_q8train(
                f, xb, cfg, plans, training=True, rng=None,
                pixel_scale=scale,
            )
            * w
        )

    g_full = jax.grad(loss)(fast, x, wgt, 1)
    g_a = jax.grad(loss)(fast, x[:, :half], wgt[:half], 2)
    g_b = jax.grad(loss)(fast, x[:, half:], wgt[half:], 2)
    for gf, ga, gb in zip(
        jax.tree_util.tree_leaves(g_full),
        jax.tree_util.tree_leaves(g_a),
        jax.tree_util.tree_leaves(g_b),
    ):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(ga) + np.asarray(gb),
            rtol=1e-6, atol=1e-8,
        )

    # regression signature: the OLD (local-shapes) decision — saved-t firing
    # on the half batch — changes the gradients it feeds the STE backward
    g_a_local = jax.grad(loss)(fast, x[:, :half], wgt[:half], 1)
    diff = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(g_a),
            jax.tree_util.tree_leaves(g_a_local),
        )
    )
    assert diff > 1e-6, (
        "saved-t variant did not change gradients — the cap pin missed"
    )


def test_sp_and_sp_tp_score_forward_factories_refuse_unknown_qat():
    """ADVICE r3: the SP / SP×TP score and forward factories must reject a
    typo'd qat mode up front (same guard as the train steps) instead of
    silently scoring full precision."""
    from dctn_tpu.parallel.sp_tp import (
        make_sp_tp_forward,
        make_sp_tp_score_fn,
    )
    from dctn_tpu.parallel.spatial_parallel import (
        make_sp_forward,
        make_sp_score_fn,
    )

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
    )

    class _FakeMesh:  # the guard must fire before any mesh use
        shape = {"data": 1, "space": 2, "model": 2}

    mesh = _FakeMesh()
    with pytest.raises(ValueError, match="unsupported qat"):
        make_sp_forward(cfg, mesh, qat="int4")
    with pytest.raises(ValueError, match="unsupported qat"):
        make_sp_score_fn(cfg, mesh, batch_size=4, qat="int4")
    with pytest.raises(ValueError, match="unsupported qat"):
        make_sp_tp_forward(cfg, mesh, params3=None, qat="int4")
    with pytest.raises(ValueError, match="unsupported qat"):
        make_sp_tp_score_fn(cfg, mesh, batch_size=4, params3=None, qat="int4")
