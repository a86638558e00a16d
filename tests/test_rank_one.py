"""RankOneTensorsBatch statistics vs a densified oracle (strategy: reference
tests/test_rank_one_tensor.py — analytic oracle on a small batch, here the
dense batch is built explicitly in float64 and all stats compared)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.ops.rank_one import RankOneTensorsBatch


def dense_batch(array, factors_dim, coordinates_dim):
    """Explicitly build each rank-one tensor and flatten its coordinates."""
    arr = np.moveaxis(np.asarray(array), (factors_dim, coordinates_dim), (0, 1))
    f, q = arr.shape[:2]
    batch_shape = arr.shape[2:]
    flat = arr.reshape(f, q, -1)
    out = []
    for b in range(flat.shape[-1]):
        t = flat[0, :, b]
        for i in range(1, f):
            t = np.multiply.outer(t, flat[i, :, b])
        out.append(t.reshape(-1))
    return np.array(out)  # (ntensors, q**f)


@pytest.mark.parametrize("shape,fdim,cdim", [((3, 2, 5), 0, 1), ((4, 3, 2, 6), 1, 3)])
def test_stats_vs_dense(rng, shape, fdim, cdim):
    array = jax.random.normal(rng, shape, jnp.float64)
    r1t = RankOneTensorsBatch(array, fdim, cdim)
    dense = dense_batch(array, fdim, cdim)

    assert r1t.ncoordinates == dense.shape[1]
    assert r1t.ntensors == dense.shape[0]
    np.testing.assert_allclose(
        np.sort(np.ravel(r1t.sum_per_tensor())), np.sort(dense.sum(axis=1))
    )
    np.testing.assert_allclose(float(r1t.sum_over_batch()), dense.sum())
    np.testing.assert_allclose(float(r1t.mean_over_batch()), dense.mean())
    np.testing.assert_allclose(
        np.sort(np.ravel(r1t.squared_fro_norm_per_tensor())),
        np.sort((dense**2).sum(axis=1)),
    )
    np.testing.assert_allclose(
        float(r1t.squared_fro_norm_over_batch()), (dense**2).sum()
    )
    np.testing.assert_allclose(float(r1t.var_over_batch(True)), dense.var(ddof=1))
    np.testing.assert_allclose(float(r1t.var_over_batch(False)), dense.var(ddof=0))
    np.testing.assert_allclose(float(r1t.std_over_batch(False)), dense.std(ddof=0))


def test_hand_computed():
    # batch of two rank-one tensors, each with 2 factors of 2 coords:
    # T1 = [1,2] ⊗ [3,4], T2 = [0,1] ⊗ [1,1]
    array = jnp.array(
        [[[1.0, 2.0], [0.0, 1.0]], [[3.0, 4.0], [1.0, 1.0]]]
    )  # (factors=2, batch=2, coords=2)
    r1t = RankOneTensorsBatch(array, factors_dim=0, coordinates_dim=2)
    np.testing.assert_allclose(np.asarray(r1t.sum_per_tensor()), [21.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(r1t.squared_fro_norm_per_tensor()), [125.0, 2.0]
    )
    # dense elements: T1 = [3,4,6,8], T2 = [0,0,1,1]
    vals = np.array([3.0, 4.0, 6.0, 8.0, 0.0, 0.0, 1.0, 1.0])
    np.testing.assert_allclose(float(r1t.mean_over_batch()), vals.mean())
    np.testing.assert_allclose(float(r1t.var_over_batch(False)), vals.var())
