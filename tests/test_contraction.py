"""Contraction planner: consistent results and plan-cache behavior (strategy:
reference tests/test_contraction_path_cache.py — determinism + identity)."""

import jax
import jax.numpy as jnp
import numpy as np

from dctn_tpu.ops.contraction import contract, plan_info, clear_plan_cache


def test_matches_einsum(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    a = jax.random.normal(k1, (3, 4), jnp.float64)
    b = jax.random.normal(k2, (4, 5), jnp.float64)
    c = jax.random.normal(k3, (5, 2), jnp.float64)
    got = contract(a, ("i", "j"), b, ("j", "k"), c, ("k", "l"), ("i", "l"))
    expected = np.asarray(a) @ np.asarray(b) @ np.asarray(c)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12)


def test_scalar_output(rng):
    a = jax.random.normal(rng, (3, 3), jnp.float64)
    got = contract(a, ("i", "j"), a, ("i", "j"), ())
    np.testing.assert_allclose(float(got), float(jnp.sum(a * a)), rtol=1e-12)


def test_plan_cache_hits(rng):
    clear_plan_cache()
    a = jax.random.normal(rng, (3, 4), jnp.float64)
    b = jax.random.normal(rng, (4, 5), jnp.float64)
    contract(a, ("i", "j"), b, ("j", "k"), ("i", "k"))
    info1 = plan_info()
    contract(a, ("i", "j"), b, ("j", "k"), ("i", "k"))
    info2 = plan_info()
    assert info2["cached_plans"] == info1["cached_plans"] == 1
    assert info2["hits"] == info1["hits"] + 1


def test_same_network_different_names_share_no_state(rng):
    """Dim names are local to each call; renaming gives identical results."""
    a = jax.random.normal(rng, (3, 4), jnp.float64)
    b = jax.random.normal(rng, (4, 3), jnp.float64)
    r1 = contract(a, ("x", "y"), b, ("y", "z"), ("x", "z"))
    r2 = contract(a, ("height", "w0"), b, ("w0", "out"), ("height", "out"))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))
