"""Fused Pallas EPS forward (interpreter mode on CPU): parity with the XLA
path across layer shapes, padding, and the VMEM-fallback predicate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.ops import eps as E
from dctn_tpu.pallas.eps_pallas import pallas_forward_fits


@pytest.mark.parametrize(
    "C,K,Q,O,H,W,B",
    [
        (1, 2, 2, 3, 4, 4, 2),
        (1, 3, 2, 4, 6, 5, 3),
        (2, 2, 2, 3, 4, 4, 2),
        (1, 2, 3, 5, 5, 5, 2),
        (3, 2, 2, 3, 4, 4, 2),  # C=3: the CIFAR colored family's shape
    ],
)
def test_pallas_forward_matches_xla(rng, C, K, Q, O, H, W, B):
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float32)
    x = jax.random.normal(k2, (C, B, H, W, Q), jnp.float32)
    expected = E.eps(core, x)
    got = E.eps(core, x, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize(
    "C,K,Q,O,H,W,B",
    [
        (1, 2, 2, 3, 4, 4, 2),
        (1, 3, 2, 4, 6, 5, 3),
        (2, 2, 2, 3, 4, 4, 2),
        (3, 2, 2, 3, 4, 4, 2),
    ],
)
def test_pallas_gradients_match_xla(rng, C, K, Q, O, H, W, B):
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float32)
    x = jax.random.normal(k2, (C, B, H, W, Q), jnp.float32)

    def loss(c, xx, backend):
        return jnp.sum(jnp.tanh(E.eps(c, xx, backend=backend)))

    g1c, g1x = jax.grad(loss, argnums=(0, 1))(core, x, "xla")
    g2c, g2x = jax.grad(loss, argnums=(0, 1))(core, x, "pallas_interpret")
    # atol 5e-5: at C=3 the window holds n=12 factors (2^12-term
    # contractions), so f32 summation-order noise between the two backends
    # reaches ~2e-5 abs (both verified within f32 rounding of the f64 oracle)
    np.testing.assert_allclose(np.asarray(g1c), np.asarray(g2c), rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g2x), rtol=2e-4, atol=5e-5)


def test_model_eval_backend(rng):
    from dctn_tpu.models import (
        EPSesPlusLinearConfig,
        init_eps_plus_linear,
        eps_plus_linear_forward,
    )

    cfg = EPSesPlusLinearConfig(epses_specs=((2, 3), (2, 4)), image_size=6)
    cfg_p = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, eval_backend="pallas_interpret"
    )
    params = init_eps_plus_linear(rng, cfg)
    x = jax.random.uniform(jax.random.split(rng)[0], (1, 3, 6, 6, 2), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(eps_plus_linear_forward(params, x, cfg_p)),
        np.asarray(eps_plus_linear_forward(params, x, cfg)),
        rtol=2e-5,
        atol=1e-6,
    )


def test_two_pass_backward_matches_xla(rng, monkeypatch):
    """Force the two-pass (d_core kernel + d_views kernel) backward — the
    path large cores take — and check gradient parity."""
    import dctn_tpu.pallas.eps_pallas as ep

    monkeypatch.setattr(ep, "_FUSED_MIN_BN", 10**9)  # fused never eligible
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(3, 1, 2, 4), jnp.float32)
    x = jax.random.normal(k2, (1, 2, 6, 5, 2), jnp.float32)

    def loss(c, xx, backend):
        return jnp.sum(jnp.tanh(E.eps(c, xx, backend=backend)))

    g1 = jax.grad(loss, argnums=(0, 1))(core, x, "xla")
    g2 = jax.grad(loss, argnums=(0, 1))(core, x, "pallas_interpret")
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize(
    "C,Q,K,n1,O,H,W,B,want_mode,budget_mb",
    [
        # flagship eps2 shape under the legacy 16 MB-era budget → two-pass-
        # with-t (the real-VMEM default upgrades it to fused_t; both arms
        # must stay covered)
        (1, 4, 3, 5, 6, 10, 10, 3, "two_t", 14),
        (1, 4, 3, 5, 6, 10, 10, 3, "fused_t", None),  # default budget
        (1, 2, 4, 8, 4, 12, 12, 2, "fused_t", None),  # merged-pair eps1 shape
    ],
)
def test_save_t_backward_matches_recompute(
    rng, monkeypatch, C, Q, K, n1, O, H, W, B, want_mode, budget_mb
):
    """The forward-saved-t backward (which drops the t-recompute matmul — 1
    of the backward's MXU passes) must match the recompute backward. Both the
    fused_t and the two-pass-with-t dispatch arms are pinned."""
    import dctn_tpu.pallas.eps_pallas as ep

    if budget_mb is not None:
        monkeypatch.setattr(ep, "_VMEM_BUDGET_BYTES", budget_mb << 20)
        monkeypatch.setattr(ep, "_BN_CANDIDATES", (1024, 512, 256, 128))

    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, (Q,) * (K * K * C) + (O,), jnp.float32) * 0.1
    xT = jax.random.uniform(k2, (C, Q, H, W, B), jnp.float32)
    npix = B * (H - K + 1) * (W - K + 1)
    n1r, bn, merge, mm = ep.plan_pallas_call(C, Q, K, n1, O, npix, None, True)

    def loss(c, xx):
        out = ep.eps_pallas_apply_t(c, xx, K, n1r, bn, True, mm, merge, False)
        return jnp.sum(out * jnp.cos(out))

    monkeypatch.setenv("DCTN_TPU_SAVE_T_MIN_A", "999999")  # recompute path
    l0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(core, xT)
    monkeypatch.setenv("DCTN_TPU_SAVE_T_MIN_A", "0")  # force save-t
    n_k, q_k, n1_k = ep._kernel_dims(C, Q, K, n1r, merge)
    plan = ep._save_t_plan(
        n_k, n1_k, q_k, O, bn, mm, -(-npix // bn) * bn, False
    )
    assert plan is not None and plan[0] == want_mode
    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(core, xT)
    assert l0 == l1  # forward identical (t write does not change out)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_save_t_plan_gates():
    """force_two_pass, n2 == 0, small a, and the HBM cap all disable save-t."""
    import dctn_tpu.pallas.eps_pallas as ep

    f32 = jnp.float32
    assert ep._save_t_plan(9, 5, 4, 6, 512, f32, 1024, True) is None  # 2-pass
    assert ep._save_t_plan(4, 4, 4, 6, 512, f32, 1024, False) is None  # n2==0
    assert ep._save_t_plan(9, 2, 4, 6, 512, f32, 1024, False) is None  # a=16
    import os

    os.environ["DCTN_TPU_SAVE_T_MAX_BYTES"] = "1000"
    try:
        assert ep._save_t_plan(9, 5, 4, 6, 512, f32, 1 << 20, False) is None
    finally:
        del os.environ["DCTN_TPU_SAVE_T_MAX_BYTES"]


def test_save_t_plan_flagship_chip_mode(monkeypatch):
    """Pin the static plans the REAL CHIP uses (mm_dtype=bf16) for the
    flagship two-EPS config: L1 (9,4,6) saves t and — under the real-VMEM
    default budget — takes the FUSED single-pass saved-t backward (under
    the legacy 16 MB-era budget it degraded to two-pass-with-t);
    L0 (merged (16,2,4) → (8,4,4)) is force_two_pass (its d_views pass is
    DCEd) so it never saves t."""
    import dctn_tpu.pallas.eps_pallas as ep

    bf16 = jnp.bfloat16
    npad_l1 = 128 * 23 * 23  # bs 128, exact bn multiple not required here
    plan_l1 = ep._save_t_plan(9, 5, 4, 6, 512, bf16, npad_l1, False)
    assert plan_l1 is not None and plan_l1[0] == "fused_t"
    assert ep._save_t_plan(8, 4, 4, 4, 512, bf16, 128 * 25 * 25, True) is None
    # legacy budget: the same layer degrades to the two-pass-with-t arm
    monkeypatch.setattr(ep, "_VMEM_BUDGET_BYTES", 14 << 20)
    monkeypatch.setattr(ep, "_BN_CANDIDATES", (1024, 512, 256, 128))
    plan_legacy = ep._save_t_plan(9, 5, 4, 6, 512, bf16, npad_l1, False)
    assert plan_legacy is not None and plan_legacy[0] == "two_t"


def test_save_t_capped():
    """save_t_capped is True exactly when the HBM cap is the ONLY reason the
    saved-t backward is off (flagship L1 at bs 8192), False when the plan
    fires (bs 2048) or the layer is never profitable (L0's a=256 < MIN_A)."""
    import dctn_tpu.pallas.eps_pallas as ep

    # flagship L1 (c=1, q=4, k=3, o=6) on a 25×25 input → 23×23 output
    assert ep.save_t_capped(1, 4, 3, 5, 6, 8192 * 23 * 23, None)  # 13 GB > cap
    assert not ep.save_t_capped(1, 4, 3, 5, 6, 2048 * 23 * 23, None)  # plan on
    # flagship L0 (merged (16,2,4)→(8,4,4)): a=256 < MIN_A — cap irrelevant
    assert not ep.save_t_capped(1, 2, 4, 8, 4, 8192 * 25 * 25, None)


def test_vmem_predicate():
    assert pallas_forward_fits(16, 8, 2, 4)  # layer 1: cm 1 MB
    assert pallas_forward_fits(9, 5, 4, 6)  # layer 2: cm 6 MB
    assert not pallas_forward_fits(16, 8, 4, 4)  # 4^16 core: never


def test_transposed_pipeline_grads_match_xla(rng):
    """The model-level transposed Pallas pipeline (zero inter-layer
    relayouts, two-pass layer-0 backward) must produce the same parameter
    GRADIENTS as the XLA path — this is the training configuration."""
    from dctn_tpu.models import (
        EPSesPlusLinearConfig,
        init_eps_plus_linear,
        eps_plus_linear_forward,
    )

    cfg_x = EPSesPlusLinearConfig(epses_specs=((2, 3), (2, 4)), image_size=6)
    cfg_p = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)),
        image_size=6,
        train_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(rng, cfg_x)
    k = jax.random.split(rng)[0]
    x = jax.random.uniform(k, (1, 3, 6, 6, 2), jnp.float32)
    y = jnp.array([0, 3, 7])

    def loss(p, cfg):
        logits = eps_plus_linear_forward(p, x, cfg, training=True, rng=rng)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))

    gx = jax.grad(loss)(params, cfg_x)
    gp = jax.grad(loss)(params, cfg_p)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_transposed_pipeline_input_grads_not_zeroed(rng):
    """force_two_pass on layer 0 must NOT break d(loss)/d(x) when someone
    does differentiate the input (the DCE trick only removes unused work)."""
    from dctn_tpu.models import (
        EPSesPlusLinearConfig,
        init_eps_plus_linear,
        eps_plus_linear_forward,
    )

    cfg_x = EPSesPlusLinearConfig(epses_specs=((2, 3),), image_size=5)
    cfg_p = EPSesPlusLinearConfig(
        epses_specs=((2, 3),), image_size=5, train_backend="pallas_interpret"
    )
    params = init_eps_plus_linear(rng, cfg_x)
    x = jax.random.uniform(jax.random.split(rng)[0], (1, 2, 5, 5, 2), jnp.float32)

    def loss(xx, cfg):
        return jnp.sum(
            jnp.tanh(eps_plus_linear_forward(params, xx, cfg, training=True))
        )

    gx = jax.grad(loss)(x, cfg_x)
    gp = jax.grad(loss)(x, cfg_p)
    assert float(jnp.max(jnp.abs(gp))) > 0.0
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=2e-4, atol=2e-6)


def test_bf16_operand_path(rng):
    """The real-backend configuration (bf16 matmul operands — what the MXU's
    single DEFAULT-precision pass truncates to anyway) at bf16 tolerances."""
    from dctn_tpu.pallas.eps_pallas import eps_pallas_apply
    from dctn_tpu.ops.eps import _balanced_split

    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(2, 1, 2, 3), jnp.float32)
    x = jax.random.normal(k2, (1, 2, 5, 5, 2), jnp.float32)
    n1 = _balanced_split(4, 2, 3)

    def loss(c, xx, mm):
        return jnp.sum(
            jnp.tanh(eps_pallas_apply(c, xx, 2, n1, interpret=True, mm_dtype=mm))
        )

    out_ref = jax.grad(loss, argnums=(0, 1))(core, x, jnp.float32)
    out_b16 = jax.grad(loss, argnums=(0, 1))(core, x, jnp.bfloat16)
    for a, b in zip(out_b16, out_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.1, atol=0.05
        )


def test_remat_composes_with_pallas_pipeline(rng):
    """cfg.remat wraps each transposed-pipeline layer in jax.checkpoint —
    gradients must be unchanged (memory/time tradeoff only)."""
    from dctn_tpu.models import (
        EPSesPlusLinearConfig,
        init_eps_plus_linear,
        eps_plus_linear_forward,
    )

    base = dict(epses_specs=((2, 3), (2, 4)), image_size=6,
                train_backend="pallas_interpret")
    cfg = EPSesPlusLinearConfig(**base)
    cfg_r = EPSesPlusLinearConfig(**base, remat=True)
    params = init_eps_plus_linear(rng, cfg)
    x = jax.random.uniform(jax.random.split(rng)[0], (1, 3, 6, 6, 2), jnp.float32)

    def loss(p, c):
        return jnp.sum(jnp.tanh(eps_plus_linear_forward(p, x, c, training=True)))

    g1 = jax.grad(loss)(params, cfg)
    g2 = jax.grad(loss)(params, cfg_r)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)


def test_tiled_dcore_matches_full(rng):
    """The o-TILED d_core accumulator (2-D grid, accumulator block revisited
    across the pixel sweep — how cores whose full f32 d_cmt exceeds VMEM get
    a backward) must produce the same (d_views, d_cmt) as the single-block
    pass: per-tile summation order over pixels is identical, so the match is
    exact in f32."""
    import dctn_tpu.pallas.eps_pallas as ep

    k1, k2, k3 = jax.random.split(rng, 3)
    K, C, Q, O = 3, 1, 3, 8
    n = K * K * C
    n1 = 5
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float32)
    x = jax.random.normal(k2, (C, 2, 6, 6, Q), jnp.float32)
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    views_t, npix = ep._stack_views_from_xT(xT, K, 128, merge_pairs=False)
    cmt = ep._core_to_cmt_k(core, n1, Q)
    g = jax.random.normal(k3, (O, views_t.shape[-1]), jnp.float32)

    outs = {}
    for ot in (O, 4, 2, 1):
        dviews, d_cmt = ep._run_bwd(
            views_t, cmt, g, n1, O, 128, 128, True, jnp.float32, ot=ot
        )
        outs[ot] = (np.asarray(dviews), np.asarray(d_cmt))
    for ot in (4, 2, 1):
        np.testing.assert_allclose(outs[ot][0], outs[O][0], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(outs[ot][1], outs[O][1], rtol=1e-6, atol=1e-7)


def test_large_core_bf16_gradients(rng, monkeypatch):
    """End-to-end gradients through a core whose full f32 d_cmt exceeds a
    16 MB-era VMEM budget — the recorded three-EPS family's (K=3, Q_in=4,
    O=12) middle layer — on the bf16-resident o-tiled plan. The default
    budget now uses the chip's real 128 MB VMEM and runs this layer
    untiled, so the legacy budget is forced here to keep the o-tiled
    machinery covered (it still fires for cores ≥ ~8x this one).
    bf16 tolerances vs the XLA f32 oracle."""
    import dctn_tpu.pallas.eps_pallas as ep
    from dctn_tpu.pallas.eps_pallas import _dcore_plan, pallas_forward_fits

    monkeypatch.setattr(ep, "_VMEM_BUDGET_BYTES", 14 * 1024 * 1024)
    monkeypatch.setattr(ep, "_BN_CANDIDATES", (1024, 512, 256, 128))
    # the legacy-budget plan decisions for this layer
    assert not pallas_forward_fits(9, 5, 4, 12, mm_bytes=4)
    assert pallas_forward_fits(9, 5, 4, 12, mm_bytes=2)
    bn_a, ot = _dcore_plan(9, 5, 4, 12, 1024, 2)
    assert ot < 12  # the accumulator really is o-tiled

    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(3, 1, 4, 12), jnp.float32)
    core = core * (4.0 ** -4.5)
    x = jax.random.normal(k2, (1, 2, 5, 5, 4), jnp.float32)

    def loss(c, xx, backend, mm):
        return jnp.sum(
            jnp.tanh(E.eps(c, xx, backend=backend, compute_dtype=mm))
        )

    g_ref = jax.grad(loss, argnums=(0, 1))(core, x, "xla", None)
    g_pal = jax.grad(loss, argnums=(0, 1))(
        core, x, "pallas_interpret", jnp.bfloat16
    )
    # vs the f32 oracle the check is norm-based only: bf16-resident operands
    # leave an elementwise tail at cancellation points (measured 99.99%-q
    # relative error ~0.2 among the 3.1M d_core entries) that is inherent to
    # the dtype, not the tiling — the bf16 trajectory tests in
    # test_fast_layout.py cover the end-to-end training effect.
    for a, b in zip(g_pal, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        rel_l2 = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel_l2 < 0.02, rel_l2


def test_tiled_dcore_bitexact_in_bf16(rng):
    """What the o-tiling actually adds must be numerically FREE: with
    bf16-resident operands, each d_cmt row accumulates the same per-pixel-
    block contributions in the same order regardless of ot, so the tiled
    backward is bit-exact vs the untiled one (kernel-level analog of
    test_tiled_dcore_matches_full, at the dtype the chip really runs)."""
    import dctn_tpu.pallas.eps_pallas as ep

    k1, k2, k3 = jax.random.split(rng, 3)
    K, C, Q, O = 3, 1, 4, 12
    n1 = 5
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float32)
    core = core * (4.0 ** -4.5)
    x = jax.random.normal(k2, (C, 2, 5, 5, Q), jnp.float32)
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    views_t, _ = ep._stack_views_from_xT(xT, K, 128, merge_pairs=False)
    cmt = ep._core_to_cmt_k(core, n1, Q).astype(jnp.bfloat16)
    g = jax.random.normal(k3, (O, views_t.shape[-1]), jnp.float32)

    outs = {}
    for ot in (O, 6, 1):
        dv, dc = ep._run_bwd(
            views_t, cmt, g, n1, O, 128, 128, True, jnp.bfloat16, ot=ot
        )
        outs[ot] = (np.asarray(dv), np.asarray(dc))
    for ot in (6, 1):
        np.testing.assert_array_equal(outs[ot][0], outs[O][0])
        np.testing.assert_array_equal(outs[ot][1], outs[O][1])


def test_tpu_lowering_of_tiled_dcore_backward(rng, monkeypatch):
    """Mosaic's block-mapping legality (last-two block dims must be sublane/
    lane multiples or span the whole array) is enforced only when LOWERING
    for a real TPU target — interpret-mode tests cannot see it. r3 chip
    regression: the o-tiled d_core pass blocked the cotangent as a partial
    (ot=6, bn) slab of the (o=12, npad) array and the chip rejected the
    recorded three-EPS family's step; the tiled dispatch now reshapes g to
    (o//ot, ot, npad) so its block's second-minor dim equals the array dim.
    jax.export runs the full Mosaic lowering from this CPU host."""
    from jax import export as jax_export
    import dctn_tpu.pallas.eps_pallas as ep

    # force the 16 MB-era budget: under the real 128 MB VMEM default this
    # layer runs untiled, and the lowering below would check nothing
    monkeypatch.setattr(ep, "_VMEM_BUDGET_BYTES", 14 * 1024 * 1024)
    monkeypatch.setattr(ep, "_BN_CANDIDATES", (1024, 512, 256, 128))
    _, ot = ep._dcore_plan(9, 5, 4, 12, 1024, 2)
    assert 0 < ot < 12

    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(3, 1, 4, 12), jnp.float32)
    x = jax.random.normal(k2, (1, 8, 5, 5, 4), jnp.float32)

    def loss(c, xx):
        return jnp.sum(
            E.eps(c, xx, split=5, backend="pallas", compute_dtype=jnp.bfloat16)
        )

    f = jax.jit(jax.grad(loss, argnums=(0, 1)))
    exported = jax_export.export(f, platforms=("tpu",))(core, x)
    assert exported.platforms == ("tpu",)


def test_tpu_lowering_of_flagship_fast_train_step():
    """The driver dryrun exercises interpret-mode Pallas only; nothing else
    pushed the TRAINING backward through the Mosaic lowering off-device.
    Lower the flagship two-EPS fast-layout train step (saved-t layer-2
    backward + force_two_pass layer-1) for the TPU platform from this CPU
    host so kernel block legality is checked in CI, not first on the chip."""
    import dataclasses

    from jax import export as jax_export

    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
    from dctn_tpu.train import make_optimizer
    from dctn_tpu.train.step import make_fast_train_step

    cfg_i = EPSesPlusLinearConfig(
        epses_specs=((4, 4), (3, 6)), image_size=12, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg_i)
    cfg = dataclasses.replace(
        cfg_i, train_backend="pallas", eval_backend="pallas"
    )
    fast, plans = fast_params_from_reference(params, cfg)
    opt = make_optimizer("adam", 1e-3)
    step = make_fast_train_step(
        cfg, opt, plans, "epses_composition", 1e-3, donate=False
    )
    x = jnp.zeros((1, 8, 12, 12, 2), jnp.float32)
    y = jnp.zeros((8,), jnp.int32)
    exported = jax_export.export(jax.jit(step), platforms=("tpu",))(
        fast, opt.init(fast), jax.random.PRNGKey(1), x, y
    )
    assert exported.platforms == ("tpu",)
