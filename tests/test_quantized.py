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
