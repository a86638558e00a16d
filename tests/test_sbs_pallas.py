"""Fused Pallas ConvSBS kernels (interpreter mode on CPU): forward + gradient
parity with the XLA chain-fold path, including the legacy snake strings and
the 2-channel merged-factor case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.ops import sbs
from dctn_tpu.utils.pos2d import Pos2D
from dctn_tpu.pallas.sbs_pallas import sbs_plan


def _string(positions, out_dims, bond_sizes, channels, q=2):
    return sbs.SBSSpecString(
        tuple(
            sbs.SBSSpecCore(Pos2D(h, w), o)
            for (h, w), o in zip(positions, out_dims)
        ),
        tuple(bond_sizes),
        channels,
        q,
    )


SNAKE9 = [(0, 0), (0, 1), (0, 2), (1, 2), (1, 1), (1, 0), (2, 0), (2, 1), (2, 2)]

CASES = [
    # 2×2 grid, open string, one out dim in the middle
    _string([(0, 0), (0, 1), (1, 0), (1, 1)], (1, 3, 1, 1), (1, 2, 3, 2), 1),
    # legacy 3×3 snake, bond 2, middle core out 2
    _string(SNAKE9, (1, 1, 1, 1, 2, 1, 1, 1, 1), (1, 2, 2, 2, 2, 2, 2, 2, 2), 1),
    # final-layer-like: middle core emits 10, bond 4
    _string(SNAKE9, (1, 1, 1, 1, 10, 1, 1, 1, 1), (1, 4, 4, 4, 4, 4, 4, 4, 4), 1),
    # 2-channel string (merged q^C = 4 factors)
    _string([(0, 0), (0, 1), (1, 1), (1, 0)], (2, 1, 1, 1), (1, 2, 2, 2), 2),
    # 3-channel string (CIFAR-colored: merged q^C = 8 factors)
    _string([(0, 0), (0, 1), (1, 1), (1, 0)], (1, 3, 1, 1), (1, 2, 2, 2), 3),
]


def _random_cores(rng, spec):
    ks = jax.random.split(rng, len(spec))
    return [
        0.5 * jax.random.normal(k, s.as_tuple(), jnp.float32)
        for k, s in zip(ks, spec.shapes)
    ]


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_sbs_pallas_forward_matches_xla(rng, idx):
    spec = CASES[idx]
    assert sbs_plan(spec)[2]
    cores = _random_cores(rng, spec)
    x = jax.random.uniform(
        jax.random.split(rng)[0],
        (spec.in_num_channels, 2, 5, 5, spec.in_quantum_dim_size),
        jnp.float32,
    )
    ref = sbs.conv_sbs(spec, cores, x)
    got = sbs.conv_sbs(spec, cores, x, backend="pallas_interpret")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("idx", [0, 1, 3, 4])
def test_sbs_pallas_grads_match_xla(rng, idx):
    spec = CASES[idx]
    cores = _random_cores(rng, spec)
    x = jax.random.uniform(
        jax.random.split(rng)[0],
        (spec.in_num_channels, 2, 5, 5, spec.in_quantum_dim_size),
        jnp.float32,
    )

    def loss(cs, xx, backend):
        return jnp.sum(jnp.tanh(sbs.conv_sbs(spec, cs, xx, backend)))

    gc1, gx1 = jax.grad(loss, argnums=(0, 1))(cores, x, "xla")
    gc2, gx2 = jax.grad(loss, argnums=(0, 1))(cores, x, "pallas_interpret")
    for a, b in zip(gc1, gc2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), rtol=2e-4, atol=2e-6)


def test_sbs_pallas_ring_fwd_and_grad(rng):
    """trace_edge rings (bond_sizes[0] > 1): the fused kernel closes the
    ring with an in-kernel δ-trace — forward + gradient parity."""
    spec = _string([(0, 0), (0, 1), (1, 0), (1, 1)], (1, 2, 1, 1), (2, 2, 2, 2), 1)
    assert sbs_plan(spec)[2]
    cores = _random_cores(rng, spec)
    x = jax.random.uniform(jax.random.split(rng)[0], (1, 2, 4, 4, 2), jnp.float32)

    def loss(cs, xx, backend):
        return jnp.sum(jnp.tanh(sbs.conv_sbs(spec, cs, xx, backend)))

    ref = sbs.conv_sbs(spec, cores, x)
    got = sbs.conv_sbs(spec, cores, x, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-6)
    gc1, gx1 = jax.grad(loss, argnums=(0, 1))(cores, x, "xla")
    gc2, gx2 = jax.grad(loss, argnums=(0, 1))(cores, x, "pallas_interpret")
    for a, b in zip(gc1, gc2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), rtol=2e-4, atol=2e-6)


def test_sbs_pallas_ring_snake_legacy(rng):
    """The legacy --trace-edge configuration: 9-core snake ring, bond 2,
    middle core out 2, forward + gradient parity."""
    spec = _string(SNAKE9, (1, 1, 1, 1, 2, 1, 1, 1, 1), (2,) * 9, 1)
    assert sbs_plan(spec)[2]
    cores = _random_cores(rng, spec)
    x = jax.random.uniform(jax.random.split(rng)[0], (1, 2, 5, 5, 2), jnp.float32)
    ref = sbs.conv_sbs(spec, cores, x)
    got = sbs.conv_sbs(spec, cores, x, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-6)

    def loss(cs, backend):
        return jnp.sum(jnp.cos(sbs.conv_sbs(spec, cs, x, backend)))

    gc1 = jax.grad(loss)(cores, "xla")
    gc2 = jax.grad(loss)(cores, "pallas_interpret")
    for a, b in zip(gc1, gc2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6)


def test_conv_sbs_model_pallas_pipeline(rng):
    """Legacy model end-to-end through the fused transposed pipeline:
    forward and parameter gradients match the XLA model."""
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        conv_sbs_model_forward,
    )

    cfg_x = ConvSBSModelConfig(num_sbs_layers=2, bond_dim_size=2)
    cfg_p = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=2, backend="pallas_interpret"
    )
    params = init_conv_sbs_model(rng, cfg_x)
    x = jax.random.uniform(jax.random.split(rng)[0], (3, 7, 7), jnp.float32)
    y = jnp.array([1, 4, 9])

    out_x = conv_sbs_model_forward(params, cfg_x, x)
    out_p = conv_sbs_model_forward(params, cfg_p, x)
    assert out_p.shape == out_x.shape == (3, 10)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=1e-6)

    def loss(p, cfg):
        logits = conv_sbs_model_forward(p, cfg, x)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))

    gx = jax.grad(loss)(params, cfg_x)
    gp = jax.grad(loss)(params, cfg_p)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-6)


def test_sbs_pallas_large_qc_dot_path(rng):
    """qc above the unroll bound (here q=16, C=2 → q^C = 256, vs the r2
    support cliff at 64): the kernels switch the qc sweeps to MXU
    dot_generals — forward AND gradients still match the XLA fold."""
    spec = _string([(0, 0), (0, 1), (1, 1)], (1, 3, 1), (1, 2, 2), 2, q=16)
    olr, qc, supported = sbs_plan(spec)
    assert qc == 256 and supported  # the r2 plan rejected qc > 64
    cores = _random_cores(rng, spec)
    cores = [0.1 * c for c in cores]  # keep the 256-term sums well-scaled
    x = jax.random.uniform(
        jax.random.split(rng)[0], (2, 2, 4, 4, 16), jnp.float32
    )
    ref = sbs.conv_sbs(spec, cores, x)
    got = sbs.conv_sbs(spec, cores, x, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-6)

    def loss(cs, xx, backend):
        return jnp.sum(jnp.tanh(sbs.conv_sbs(spec, cs, xx, backend)))

    gc1, gx1 = jax.grad(loss, argnums=(0, 1))(cores, x, "xla")
    gc2, gx2 = jax.grad(loss, argnums=(0, 1))(cores, x, "pallas_interpret")
    for a, b in zip(gc1, gc2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), rtol=5e-4, atol=5e-6)


def test_tpu_lowering_of_sbs_kernels(rng):
    """Mosaic block legality is checked only when lowering for a TPU target
    (see test_eps_pallas.py::test_tpu_lowering_* — an interpret-green
    o-tiled EPS plan was rejected on chip in r3). Cross-lower the fused
    ConvSBS fwd+bwd for every kernel variant from this CPU host: open
    strings, the legacy snake, multi-channel merged factors, a trace_edge
    ring, and the qc>64 MXU-sweep path."""
    from jax import export as jax_export

    ring = _string(
        [(0, 0), (0, 1), (1, 0), (1, 1)], (1, 2, 1, 1), (2, 2, 2, 2), 1
    )
    big_qc = _string(
        [(0, 0), (0, 1), (1, 0), (1, 1)], (1, 2, 1, 1), (1, 2, 2, 2), 2, q=16
    )
    for spec in list(CASES) + [ring, big_qc]:
        cores = _random_cores(rng, spec)
        x = jax.random.uniform(
            jax.random.split(rng)[0],
            (spec.in_num_channels, 2, 5, 5, spec.in_quantum_dim_size),
            jnp.float32,
        )

        def loss(cs, xx):
            return jnp.sum(sbs.conv_sbs(spec, cs, xx, backend="pallas"))

        exported = jax_export.export(
            jax.jit(jax.grad(loss, argnums=(0, 1))), platforms=("tpu",)
        )(cores, x)
        assert exported.platforms == ("tpu",)


def test_mim_matches_sequential_kernels(rng):
    """The r4 meet-in-the-middle fold vs the sequential fold, same plan,
    fwd AND grads: both kernel families must agree to float tolerance on
    an open string and a trace_edge ring (regression net for either)."""

    from dctn_tpu.ops import sbs as S
    from dctn_tpu.pallas.sbs_pallas import conv_sbs_pallas_t

    for trace_edge in (False, True):
        bond0 = 3 if trace_edge else 1
        spec = S.SBSSpecString(
            cores=tuple(
                S.SBSSpecCore(S.Pos2D(i // 2, i % 2), 2) for i in range(4)
            ),
            bond_sizes=(bond0, 3, 4, 2),
            in_num_channels=1,
            in_quantum_dim_size=2,
        )
        keys = jax.random.split(rng, 6)
        cores = tuple(
            0.5 * jax.random.normal(k, s.as_tuple(), jnp.float32)
            for k, s in zip(keys[:4], spec.shapes)
        )
        xT = jax.random.uniform(keys[4], (1, 2, 5, 5, 3), jnp.float32)
        g = jax.random.normal(keys[5], (16, 4, 4, 3), jnp.float32)

        def run(mim):
            out = conv_sbs_pallas_t(spec, cores, xT, interpret=True, mim=mim)
            grads = jax.grad(
                lambda cs, xt: jnp.sum(
                    conv_sbs_pallas_t(spec, cs, xt, interpret=True, mim=mim)
                    * g
                ),
                argnums=(0, 1),
            )(cores, xT)
            return out, grads

        out_m, g_m = run(True)
        out_s, g_s = run(False)
        np.testing.assert_allclose(
            np.asarray(out_m), np.asarray(out_s), rtol=1e-5, atol=1e-6
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_m), jax.tree_util.tree_leaves(g_s)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )


def test_mim_every_merge_position(rng):
    """Every legal merge cut m ∈ [1, P-1) must produce identical fwd+grads
    (the cost model picks one; correctness must not depend on the pick —
    covers the edge cuts m=1 (empty left chain) and m=P-1 (single-core
    suffix) that the cost-optimal pick may never exercise)."""
    from dctn_tpu.ops import sbs as S
    from dctn_tpu.pallas import sbs_pallas as K

    spec = S.SBSSpecString(
        cores=tuple(
            S.SBSSpecCore(S.Pos2D(i // 2, i % 2), 2) for i in range(4)
        ),
        bond_sizes=(2, 3, 4, 2),  # ring (b0=2), mixed bonds
        in_num_channels=1,
        in_quantum_dim_size=2,
    )
    keys = jax.random.split(rng, 6)
    cores = tuple(
        0.5 * jax.random.normal(k, s.as_tuple(), jnp.float32)
        for k, s in zip(keys[:4], spec.shapes)
    )
    xT = jax.random.uniform(keys[4], (1, 2, 4, 4, 3), jnp.float32)
    g = jax.random.normal(keys[5], (16, 3, 3, 3), jnp.float32)
    olr, qc, supported = K.sbs_plan(spec)
    assert supported
    views_t, npix, hp, wp = K._merge_channel_views(xT, spec.positions, qc)
    bn = K._pick_bn(olr, qc, npix)
    npad = -(-npix // bn) * bn
    if npad != npix:
        views_t = jnp.pad(views_t, ((0, 0), (0, 0), (0, npad - npix)))
    cores_lro = tuple(
        K._core_to_lro(c, o, l, r, qc) for c, (o, l, r) in zip(cores, olr)
    )
    o_total = 16

    def run(mcut):
        def loss(cl, vt):
            out = K._conv_sbs_pallas((olr, qc, bn, mcut), cl, vt, True)
            out = out[:, :npix].reshape(o_total, hp, wp, 3)
            return jnp.sum(out * g), out

        (s_, out), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                              has_aux=True)(cores_lro, views_t)
        return out, grads

    ref_out, ref_grads = run(None)  # sequential kernels
    for mcut in range(1, len(olr)):
        out, grads = run(mcut)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-6,
            err_msg=f"mcut={mcut}",
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(ref_grads),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"mcut={mcut}",
            )


def test_tuning_knobs_grads_exact(rng):
    """The r5 autotunable knobs — bn override, explicit mcut, dcore_dot MXU
    tail — must not change fwd or grads (they only re-tile/re-route the same
    math); need_dviews=False must keep d_cores exact and zero d_views."""
    from dctn_tpu.ops import sbs as S
    from dctn_tpu.pallas.sbs_pallas import conv_sbs_pallas_t

    for trace_edge in (False, True):
        bond0 = 2 if trace_edge else 1
        spec = S.SBSSpecString(
            cores=tuple(
                S.SBSSpecCore(S.Pos2D(i // 2, i % 2), 2) for i in range(4)
            ),
            bond_sizes=(bond0, 3, 4, 2),
            in_num_channels=1,
            in_quantum_dim_size=2,
        )
        keys = jax.random.split(rng, 6)
        cores = tuple(
            0.5 * jax.random.normal(k, s.as_tuple(), jnp.float32)
            for k, s in zip(keys[:4], spec.shapes)
        )
        xT = jax.random.uniform(keys[4], (1, 2, 5, 5, 3), jnp.float32)
        g = jax.random.normal(keys[5], (16, 4, 4, 3), jnp.float32)

        def run(**kw):
            out = conv_sbs_pallas_t(spec, cores, xT, interpret=True, **kw)
            grads = jax.grad(
                lambda cs, xt: jnp.sum(
                    conv_sbs_pallas_t(spec, cs, xt, interpret=True, **kw) * g
                ),
                argnums=(0, 1),
            )(cores, xT)
            return out, grads

        ref_out, ref_grads = run()
        for kw in (
            {"bn": 256},
            {"mim": True, "mcut": 2},
            {"dcore_dot": True},
            {"bn": 256, "mim": True, "mcut": 1, "dcore_dot": True},
            {"mim": False, "dcore_dot": True},
        ):
            out, grads = run(**kw)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-6,
                err_msg=str(kw),
            )
            for a, b in zip(
                jax.tree_util.tree_leaves(grads),
                jax.tree_util.tree_leaves(ref_grads),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                    err_msg=str(kw),
                )

        # need_dviews=False: exact d_cores, zero d_views
        for kw in ({}, {"dcore_dot": True}, {"mim": False}):
            out, (gc, gx) = run(need_dviews=False, **kw)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-6
            )
            for a, b in zip(gc, ref_grads[0]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                    err_msg=f"need_dviews=False {kw}",
                )
            assert float(jnp.max(jnp.abs(gx))) == 0.0


def test_model_layer0_dead_cotangent_grads_exact(rng):
    """The pallas pipeline skips layer 0's d_views (need_dviews=False,
    untrained quantum map) — parameter grads must still match XLA exactly,
    and per-layer kernel_tuning picks must be trajectory-neutral."""
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        conv_sbs_model_forward,
    )

    cfg_x = ConvSBSModelConfig(num_sbs_layers=2, bond_dim_size=3)
    params = init_conv_sbs_model(rng, cfg_x)
    x = jax.random.uniform(jax.random.split(rng)[0], (3, 7, 7), jnp.float32)
    y = jnp.array([1, 4, 9])

    def loss(p, cfg):
        logits = conv_sbs_model_forward(p, cfg, x)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))

    gx = jax.grad(loss)(params, cfg_x)
    for tuning in ((), ((256, 4, True), (128, None, True))):
        cfg_p = ConvSBSModelConfig(
            num_sbs_layers=2, bond_dim_size=3, backend="pallas_interpret",
            kernel_tuning=tuning,
        )
        gp = jax.grad(loss)(params, cfg_p)
        for a, b in zip(
            jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-6,
                err_msg=str(tuning),
            )
