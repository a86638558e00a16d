"""logmatmulexp: max-shift MXU form vs f64 oracles, extreme ranges, gradients
(strategy: reference logmatmulexp benchmark/property checks; the fused Pallas
kernel is tested separately once present)."""

import jax
import jax.numpy as jnp
import numpy as np

from dctn_tpu.ops.logmatmulexp import (
    logmatmulexp,
    logmatmulexp_lowmem,
    logmatmulexp_reference,
)


def oracle(log_a, log_b):
    a = np.exp(np.asarray(log_a, dtype=np.float64))
    b = np.exp(np.asarray(log_b, dtype=np.float64))
    return np.log(a @ b)


def test_matches_oracle(rng):
    k1, k2 = jax.random.split(rng)
    la = jax.random.normal(k1, (8, 16), jnp.float64) * 3
    lb = jax.random.normal(k2, (16, 5), jnp.float64) * 3
    np.testing.assert_allclose(np.asarray(logmatmulexp(la, lb)), oracle(la, lb), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(logmatmulexp_lowmem(la, lb)), oracle(la, lb), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(logmatmulexp_reference(la, lb)), oracle(la, lb), rtol=1e-10
    )


def test_extreme_values_stable(rng):
    """Entries around ±700 would overflow naive exp in f64; the max-shift keeps
    everything finite."""
    k1, k2 = jax.random.split(rng)
    la = jax.random.normal(k1, (4, 8), jnp.float64) * 10 + 700
    lb = jax.random.normal(k2, (8, 3), jnp.float64) * 10 - 700
    out = logmatmulexp(la, lb)
    assert bool(jnp.all(jnp.isfinite(out)))
    # against the logsumexp reference (itself stable)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(logmatmulexp_reference(la, lb)), rtol=1e-12
    )


def test_gradient_matches_reference(rng):
    k1, k2 = jax.random.split(rng)
    la = jax.random.normal(k1, (5, 7), jnp.float64)
    lb = jax.random.normal(k2, (7, 4), jnp.float64)

    def f1(a, b):
        return jnp.sum(jnp.sin(logmatmulexp(a, b)))

    def f2(a, b):
        return jnp.sum(jnp.sin(logmatmulexp_reference(a, b)))

    g1 = jax.grad(f1, argnums=(0, 1))(la, lb)
    g2 = jax.grad(f2, argnums=(0, 1))(la, lb)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-9)

    # lowmem (checkpointed) gradient identical too
    g3 = jax.grad(lambda a, b: jnp.sum(jnp.sin(logmatmulexp_lowmem(a, b))), argnums=(0, 1))(la, lb)
    for x, y in zip(g3, g1):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-12)


def test_neg_inf_handling():
    la = jnp.array([[0.0, -jnp.inf], [-jnp.inf, 0.0]], dtype=jnp.float64)
    lb = jnp.array([[0.0, -jnp.inf], [-jnp.inf, 0.0]], dtype=jnp.float64)
    out = logmatmulexp(la, lb)
    expected = np.array([[0.0, -np.inf], [-np.inf, 0.0]])
    np.testing.assert_allclose(np.asarray(out), expected)
