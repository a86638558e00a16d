"""Pallas fused logmatmulexp (interpreter mode on CPU): forward vs f64 oracle,
gradient vs the jnp reference implementation, padding shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.pallas.logmatmulexp_pallas import logmatmulexp_pallas
from dctn_tpu.ops.logmatmulexp import logmatmulexp_reference


@pytest.mark.parametrize("shape", [(128, 256, 128), (256, 256, 256), (100, 60, 37)])
def test_forward_matches_oracle(rng, shape):
    theta, r, i = shape
    k1, k2 = jax.random.split(rng)
    la = (jax.random.normal(k1, (theta, r), jnp.float64) * 3).astype(jnp.float32)
    lb = (jax.random.normal(k2, (r, i), jnp.float64) * 3).astype(jnp.float32)
    got = logmatmulexp_pallas(la, lb, True)
    expected = np.log(
        np.exp(np.asarray(la, np.float64)) @ np.exp(np.asarray(lb, np.float64))
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5)


def test_gradient_matches_reference(rng):
    k1, k2 = jax.random.split(rng)
    la = (jax.random.normal(k1, (64, 128), jnp.float64)).astype(jnp.float32)
    lb = (jax.random.normal(k2, (128, 64), jnp.float64)).astype(jnp.float32)

    def f_pallas(a, b):
        return jnp.sum(jnp.sin(logmatmulexp_pallas(a, b, True)))

    def f_ref(a, b):
        return jnp.sum(jnp.sin(logmatmulexp_reference(a, b)))

    g1 = jax.grad(f_pallas, argnums=(0, 1))(la, lb)
    g2 = jax.grad(f_ref, argnums=(0, 1))(la, lb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_large_magnitudes_stable(rng):
    k1, k2 = jax.random.split(rng)
    la = (jax.random.normal(k1, (32, 128)) * 10 + 80).astype(jnp.float32)
    lb = (jax.random.normal(k2, (128, 32)) * 10 - 80).astype(jnp.float32)
    out = logmatmulexp_pallas(la, lb, True)
    assert bool(jnp.all(jnp.isfinite(out)))
    expected = logmatmulexp_reference(la.astype(jnp.float64), lb.astype(jnp.float64))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4)


def test_tpu_lowering_of_logmatmulexp_kernel(rng):
    """Cross-lower the fused log-space matmul fwd+bwd for a TPU target from
    this CPU host — Mosaic block legality is invisible to interpret mode
    (the r3 o-tiled EPS lesson, test_eps_pallas.py::test_tpu_lowering_*)."""
    from jax import export as jax_export

    k1, k2 = jax.random.split(rng)
    la = jax.random.normal(k1, (256, 256), jnp.float32)
    lb = jax.random.normal(k2, (256, 256), jnp.float32)

    def loss(a, b):
        return jnp.sum(logmatmulexp_pallas(a, b, False))

    exported = jax_export.export(
        jax.jit(jax.grad(loss, argnums=(0, 1))), platforms=("tpu",)
    )(la, lb)
    assert exported.platforms == ("tpu",)
