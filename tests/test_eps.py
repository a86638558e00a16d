"""EPS operator vs per-window densified oracles, in float64 (strategy:
reference tests/test_eps.py — oracle einsum on individual windows — plus
forward AND gradient parity between the staged MXU path and the sequential
absorption path)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.ops import eps as E
from dctn_tpu.ops.windows import window_views, make_windows, out_spatial


def oracle_per_window(core, x):
    """Contract the dense core with each window explicitly via numpy einsum."""
    core = np.asarray(core)
    x = np.asarray(x)
    C, B, H, W, Q = x.shape
    n = core.ndim - 1
    K = math.isqrt(n // C)
    O = core.shape[-1]
    Ho, Wo = H - K + 1, W - K + 1
    out = np.zeros((B, Ho, Wo, O), dtype=core.dtype)
    cm = core.reshape(-1, O)
    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                # factors in raster order, channel-minor
                vecs = [
                    x[c, b, i + dh, j + dw]
                    for dh in range(K)
                    for dw in range(K)
                    for c in range(C)
                ]
                kr = vecs[0]
                for v in vecs[1:]:
                    kr = np.multiply.outer(kr, v).reshape(-1)
                out[b, i, j] = kr @ cm
    return out


@pytest.mark.parametrize(
    "C,K,Q,O,H,W,B",
    [
        (2, 2, 2, 3, 2, 2, 2),  # 2 channels, single output pixel
        (1, 3, 2, 2, 3, 4, 2),  # 1 channel, two output pixels
        (1, 2, 3, 4, 4, 4, 3),
    ],
)
def test_eps_matches_per_window_oracle(rng, C, K, Q, O, H, W, B):
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(K, C, Q, O), jnp.float64)
    x = jax.random.normal(k2, (C, B, H, W, Q), jnp.float64)
    expected = oracle_per_window(core, x)
    np.testing.assert_allclose(np.asarray(E.eps(core, x)), expected, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(E.eps_one_by_one(core, x)), expected, rtol=1e-10
    )


@pytest.mark.parametrize("split", [1, 2, 3, None])
def test_eps_split_invariance(rng, split):
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(2, 1, 2, 3), jnp.float64)
    x = jax.random.normal(k2, (1, 2, 4, 4, 2), jnp.float64)
    base = E.eps(core, x, split=4)
    np.testing.assert_allclose(
        np.asarray(E.eps(core, x, split=split)), np.asarray(base), rtol=1e-10
    )


def test_eps_gradient_parity(rng):
    """jax.grad through the staged path equals grad through the oracle path."""
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(2, 1, 2, 3), jnp.float64)
    x = jax.random.normal(k2, (1, 2, 4, 5, 2), jnp.float64)

    def loss_staged(c, xx):
        return jnp.sum(jnp.sin(E.eps(c, xx)))

    def loss_oracle(c, xx):
        return jnp.sum(jnp.sin(E.eps_one_by_one(c, xx)))

    g1c, g1x = jax.grad(loss_staged, argnums=(0, 1))(core, x)
    g2c, g2x = jax.grad(loss_oracle, argnums=(0, 1))(core, x)
    np.testing.assert_allclose(np.asarray(g1c), np.asarray(g2c), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g2x), rtol=1e-9)


def test_contract_on_input_dims(rng):
    k1, k2 = jax.random.split(rng)
    a = jax.random.normal(k1, (2, 2, 2, 2, 3), jnp.float64)
    b = jax.random.normal(k2, (2, 2, 2, 2, 5), jnp.float64)
    got = E.contract_on_input_dims(a, b)
    expected = np.einsum(
        "ijklx,ijkly->xy", np.asarray(a), np.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12)


def test_absorb_on_input_dims(rng):
    k1, k2 = jax.random.split(rng)
    b = jax.random.normal(k1, (3, 3, 3, 5), jnp.float64)  # 3 input dims, out=5
    x = jax.random.normal(k2, (3, 4), jnp.float64)  # old_in=3 → new_in=4
    got = E.absorb_on_input_dims(b, x)
    expected = np.einsum(
        "ijko,ia,jb,kc->abco", np.asarray(b), np.asarray(x), np.asarray(x), np.asarray(x)
    )
    assert got.shape == (4, 4, 4, 5)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12)


def test_window_views_order(rng):
    """Raster, channel-minor factor order (align.py:36-39 contract)."""
    x = jax.random.normal(rng, (2, 1, 3, 3, 2), jnp.float64)
    views = window_views(x, 2)
    assert len(views) == 8  # K²·C
    # factor 0 = pos (0,0) channel 0; factor 1 = pos (0,0) channel 1
    np.testing.assert_array_equal(np.asarray(views[0]), np.asarray(x[0][:, :2, :2]))
    np.testing.assert_array_equal(np.asarray(views[1]), np.asarray(x[1][:, :2, :2]))
    # factor 2 = pos (0,1) channel 0
    np.testing.assert_array_equal(np.asarray(views[2]), np.asarray(x[0][:, :2, 1:]))


def test_make_windows_stats(rng):
    x = jax.random.uniform(rng, (1, 3, 4, 4, 2), jnp.float64)
    w = w_batch = make_windows(x, 2)
    assert w.array.shape == (4, 3, 3, 3, 2)
    assert w.batch_shape == (3, 3, 3)
    # oracle: densify each window
    xs = np.asarray(x)
    vals = []
    for b in range(3):
        for i in range(3):
            for j in range(3):
                kr = np.array([1.0])
                for dh in range(2):
                    for dw in range(2):
                        kr = np.multiply.outer(kr, xs[0, b, i + dh, j + dw]).reshape(-1)
                vals.append(kr)
    vals = np.array(vals)
    np.testing.assert_allclose(float(w.mean_over_batch()), vals.mean(), rtol=1e-10)
    np.testing.assert_allclose(
        float(w.var_over_batch(False)), vals.var(), rtol=1e-10
    )


def test_transform_in_slices(rng):
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(2, 1, 2, 3), jnp.float64)
    x = jax.random.normal(k2, (1, 7, 4, 4, 2), jnp.float64)
    out = E.transform_in_slices(core, x, batch_size=3)
    assert out.shape == (1, 7, 3, 3, 3)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(E.eps(core, x)), rtol=1e-10
    )


def test_theoretical_init_std(rng):
    core = E.make_eps_unit_theoretical_output_std(rng, 3, 1, 2, 64, jnp.float64)
    expected_std = (2 ** 9) ** -0.5
    assert abs(float(jnp.std(core)) - expected_std) / expected_std < 0.05


def test_empirical_init_unit_output_std(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.uniform(k2, (1, 64, 6, 6, 2), jnp.float64) * 2
    core = E.make_eps_unit_empirical_output_std(k1, 2, 4, x, jnp.float64, batch_size=16)
    out = E.eps(core, x)
    assert abs(float(jnp.std(out)) - 1.0) < 1e-6
