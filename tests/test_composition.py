"""EPS-composition algebra: inner product vs densified oracle and analytic
forms (strategy: reference tests/test_epses_composition.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dctn_tpu.ops import composition as C
from dctn_tpu.ops import eps as E


def test_single_layer_inner_product(rng):
    a = jax.random.normal(rng, (2, 2, 2, 2, 3), jnp.float64)
    b = jax.random.normal(jax.random.split(rng)[0], (2, 2, 2, 2, 3), jnp.float64)
    got = C.inner_product((a,), (b,))
    np.testing.assert_allclose(
        float(got), float(jnp.sum(a * b)), rtol=1e-12
    )


def densified_composition_inner_product(epses1, epses2):
    """Oracle: the inner product of two compositions equals the dot product of
    the dense linear maps they represent... computed by brute-force contraction
    of the full TN with numpy einsum on the matricized layers.

    For a composition (e₁, e₂): ⟨(e₁,e₂),(k₁,k₂)⟩ contracts e₁ with k₁ on
    input dims, yielding X (o_a × o_k), then absorbs X into every input dim of
    e₂ and dots with k₂."""
    if len(epses1) == 1:
        return float(np.sum(np.asarray(epses1[0]) * np.asarray(epses2[0])))
    a, k = np.asarray(epses1[0]), np.asarray(epses2[0])
    x = a.reshape(-1, a.shape[-1]).T @ k.reshape(-1, k.shape[-1])
    b = np.asarray(epses1[1])
    n = b.ndim - 1
    letters = "ijklmnpq"[:n]
    new = "abcdefgh"[:n]
    expr = (
        letters + "o," + ",".join(f"{l}{m}" for l, m in zip(letters, new))
        + "->" + new + "o"
    )
    new_d = np.einsum(expr, b, *([x] * n))
    return densified_composition_inner_product(
        (jnp.asarray(new_d),) + tuple(epses1[2:]), tuple(epses2[1:])
    )


def test_two_layer_inner_product(rng):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    e1 = jax.random.normal(k1, (2, 2, 2, 2, 3), jnp.float64)
    e2 = jax.random.normal(k2, (3, 3, 3, 3, 4), jnp.float64)
    f1 = jax.random.normal(k3, (2, 2, 2, 2, 3), jnp.float64)
    f2 = jax.random.normal(k4, (3, 3, 3, 3, 4), jnp.float64)
    got = float(C.inner_product((e1, e2), (f1, f2)))
    expected = densified_composition_inner_product((e1, e2), (f1, f2))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_inner_product_symmetry_and_norm(rng):
    k1, k2 = jax.random.split(rng)
    e1 = jax.random.normal(k1, (2, 2, 2, 2, 2), jnp.float64)
    e2 = jax.random.normal(k2, (2, 2, 2, 2, 3), jnp.float64)
    ip = float(C.inner_product((e1, e2), (e1, e2)))
    assert ip > 0  # it is a squared norm of the composed TN
    k3, k4 = jax.random.split(k1)
    f1 = jax.random.normal(k3, (2, 2, 2, 2, 2), jnp.float64)
    f2 = jax.random.normal(k4, (2, 2, 2, 2, 3), jnp.float64)
    ab = float(C.inner_product((e1, e2), (f1, f2)))
    ba = float(C.inner_product((f1, f2), (e1, e2)))
    np.testing.assert_allclose(ab, ba, rtol=1e-10)


def test_contract_with_input_matches_manual(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    e1 = jax.random.normal(k1, E.eps_shape(2, 1, 2, 3), jnp.float64)
    e2 = jax.random.normal(k2, E.eps_shape(2, 1, 3, 4), jnp.float64)
    x = jax.random.normal(k3, (1, 2, 4, 4, 2), jnp.float64)
    got = C.contract_with_input((e1, e2), x)
    mid = E.eps(e1, x)[None]
    expected = E.eps(e2, mid)
    assert got.shape == (2, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-12)


def test_specs_to_full_specs():
    full = C.specs_to_full_specs(((4, 4), (3, 6)), 2)
    assert full[0] == dict(kernel_size=4, in_num_channels=1, in_size=2, out_size=4)
    assert full[1] == dict(kernel_size=3, in_num_channels=1, in_size=4, out_size=6)


def test_epswise_squared_fro_norm(rng):
    e1 = jax.random.normal(rng, (2, 2, 2, 2, 3), jnp.float64)
    e2 = jax.random.normal(rng, (3, 3, 3, 3, 2), jnp.float64)
    got = float(C.epswise_squared_fro_norm((e1, e2)))
    np.testing.assert_allclose(
        got, float(jnp.sum(e1**2) + jnp.sum(e2**2)), rtol=1e-12
    )


def test_empirical_composition_init_unit_std(rng):
    x = jax.random.uniform(jax.random.split(rng)[1], (1, 48, 6, 6, 2), jnp.float64) * 2
    epses = C.make_unit_empirical_output_std(
        rng, ((2, 3), (2, 4)), x, jnp.float64, batch_size=16
    )
    # after init, pushing the init set through layer 1 then layer 2 gives
    # unit empirical std at EACH layer's output
    mid = E.eps(epses[0], x)
    assert abs(float(jnp.std(mid)) - 1.0) < 1e-6
    out = E.eps(epses[1], mid[None])
    assert abs(float(jnp.std(out)) - 1.0) < 1e-6
