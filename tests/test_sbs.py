"""ConvSBS: TT algebra vs densified oracle, Khrulkov init statistics, forward
and as_eps parity including gradients (strategies: reference
tests/test_conv_sbs.py + tests/test_conversion_of_convsbs_to_eps.py)."""

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.ops import sbs as S
from dctn_tpu.ops import eps as E
from dctn_tpu.utils.pos2d import Pos2D


def square_spec(order, bond, q=2, out_sizes=None, channels=1, trace_edge=False):
    """Build a K×K grid string whose cores visit positions in ``order``."""
    k = math.isqrt(len(order))
    positions = [Pos2D(i // k, i % k) for i in order]
    out_sizes = out_sizes or [1] * (len(order) - 1) + [3]
    cores = tuple(
        S.SBSSpecCore(p, o) for p, o in zip(positions, out_sizes)
    )
    bonds = (bond if trace_edge else 1,) + (bond,) * (len(order) - 1)
    return S.SBSSpecString(cores, bonds, channels, q)


def test_spec_shapes():
    spec = square_spec((0, 1, 3, 2), bond=4)
    shapes = spec.shapes
    assert shapes[0].as_tuple() == (1, 1, 4, 2)
    assert shapes[1].as_tuple() == (1, 4, 4, 2)
    assert shapes[-1].as_tuple() == (3, 4, 1, 2)
    assert spec.out_total_quantum_dim_size == 3
    assert spec.nelement == 2**4 * 3


def test_tt_algebra_vs_dense(rng):
    spec = square_spec((0, 1, 3, 2), bond=3)
    cores = S.init_dumb_normal(rng, spec, 0.5, jnp.float64)
    dense = np.asarray(S.as_explicit_tensor(spec, cores))
    np.testing.assert_allclose(float(S.tt_sum(spec, cores)), dense.sum(), rtol=1e-10)
    np.testing.assert_allclose(
        float(S.tt_mean(spec, cores)), dense.mean(), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(S.tt_squared_fro_norm(spec, cores)), (dense**2).sum(), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(S.tt_var(spec, cores, False)), dense.var(ddof=0), rtol=1e-8
    )
    np.testing.assert_allclose(
        float(S.tt_var(spec, cores, True)), dense.var(ddof=1), rtol=1e-8
    )


def test_tt_algebra_with_trace_edge(rng):
    spec = square_spec((0, 1, 3, 2), bond=2, trace_edge=True)
    cores = S.init_dumb_normal(rng, spec, 0.5, jnp.float64)
    dense = np.asarray(S.as_explicit_tensor(spec, cores))
    np.testing.assert_allclose(float(S.tt_sum(spec, cores)), dense.sum(), rtol=1e-10)
    np.testing.assert_allclose(
        float(S.tt_squared_fro_norm(spec, cores)), (dense**2).sum(), rtol=1e-10
    )


@pytest.mark.parametrize("bond,channels,q,trace_edge", [
    (2, 1, 2, False),
    (4, 1, 3, False),
    (2, 2, 2, False),
    (2, 1, 2, True),
])
def test_khrulkov_init_dense_std(rng, bond, channels, q, trace_edge):
    """Monte-Carlo: Khrulkov init gives the implied dense tensor approximately
    the requested std (reference test_conv_sbs.py:10-61 strategy, using the
    TT-space var identity instead of densifying)."""
    spec = square_spec(
        (0, 1, 3, 2), bond=bond, q=q, channels=channels, trace_edge=trace_edge
    )
    desired = 0.7
    n_trials = 200
    keys = jax.random.split(rng, n_trials)
    stds = []
    for k in keys:
        cores = S.init_khrulkov_normal(k, spec, desired, jnp.float64)
        stds.append(float(S.tt_std(spec, cores, unbiased=False)))
    mean_std = float(np.sqrt(np.mean(np.square(stds))))
    assert abs(mean_std - desired) / desired < 0.15


def test_forward_matches_dense_eps(rng):
    """String forward == EPS forward with the densified, reordered core."""
    for order in ((0, 1, 3, 2), (2, 3, 1, 0)):
        spec = square_spec(order, bond=3)
        cores = S.init_dumb_normal(rng, spec, 0.6, jnp.float64)
        x = jax.random.normal(rng, (1, 2, 3, 3, 2), jnp.float64)
        got = S.conv_sbs(spec, cores, x)
        eps_core = S.as_eps(spec, cores)
        expected = E.eps(eps_core, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=1e-9
        )


def test_as_eps_all_24_permutations(rng):
    """Forward AND input-gradient parity for all 24 orderings of a 2×2 grid
    (reference test_conversion_of_convsbs_to_eps.py strategy, with jax.grad)."""
    x = jax.random.normal(rng, (1, 2, 3, 3, 2), jnp.float64)
    for order in itertools.permutations(range(4)):
        spec = square_spec(order, bond=2)
        cores = S.init_dumb_normal(jax.random.fold_in(rng, hash(order) % 2**31), spec, 0.8, jnp.float64)
        eps_core = S.as_eps(spec, cores)

        def f_tt(xx):
            return jnp.sum(jnp.tanh(S.conv_sbs(spec, cores, xx)))

        def f_eps(xx):
            return jnp.sum(jnp.tanh(E.eps(eps_core, xx)))

        np.testing.assert_allclose(float(f_tt(x)), float(f_eps(x)), rtol=1e-9)
        g1 = jax.grad(f_tt)(x)
        g2 = jax.grad(f_eps)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)


def test_multichannel_forward(rng):
    spec = square_spec((0, 1, 3, 2), bond=2, channels=2)
    cores = S.init_dumb_normal(rng, spec, 0.5, jnp.float64)
    x = jax.random.normal(rng, (2, 2, 4, 4, 2), jnp.float64)
    out = S.conv_sbs(spec, cores, x)
    assert out.shape == (2, 3, 3, 3)
    # oracle via densified EPS core
    eps_core = S.as_eps(spec, cores)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(E.eps(eps_core, x)), rtol=1e-9
    )


def test_min_random_eye_mean_preservation(rng):
    """With base_std=0 the init is exact: first/last cores put 1/Q^C at [0,0,0]
    and middle cores a scaled identity, so the dense tensor sums the way the
    reference asserts (conv_sbs.py:158)."""
    spec = square_spec((0, 1, 3, 2), bond=2, out_sizes=[1, 1, 1, 2])
    cores = S.init_min_random_eye(rng, spec, base_std=0.0, dtype=jnp.float64)
    for core in (cores[0], cores[-1]):
        np.testing.assert_allclose(float(jnp.sum(core)), 1.0 / 2, atol=1e-12)


def test_multiply_by_scalar(rng):
    spec = square_spec((0, 1, 3, 2), bond=2)
    cores = S.init_dumb_normal(rng, spec, 0.5, jnp.float64)
    scaled = S.multiply_by_scalar(spec, cores, 3.5)
    d1 = np.asarray(S.as_explicit_tensor(spec, cores))
    d2 = np.asarray(S.as_explicit_tensor(spec, scaled))
    np.testing.assert_allclose(d2, 3.5 * d1, rtol=1e-10)


def test_many_conv_sbs(rng):
    specs = S.make_many_specs(
        1,
        2,
        2,
        False,
        [
            tuple(S.SBSSpecCore(Pos2D(i // 2, i % 2), 1 if i < 3 else 4) for i in (0, 1, 3, 2)),
            tuple(S.SBSSpecCore(Pos2D(i // 2, i % 2), 1 if i < 3 else 4) for i in (3, 2, 0, 1)),
        ],
    )
    cores = [S.init_dumb_normal(jax.random.fold_in(rng, i), s, 0.5, jnp.float64) for i, s in enumerate(specs)]
    x = jax.random.normal(rng, (1, 2, 3, 3, 2), jnp.float64)
    outs = S.many_conv_sbs(specs, cores, x)
    assert len(outs) == 2 and all(o.shape == (2, 2, 2, 4) for o in outs)
