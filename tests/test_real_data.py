"""Real-data learning check: sklearn's built-in digits (the only real image
dataset available offline) through the full stack — φ feature map, f64 ν
window scaling, empirical init, training, evaluation. Complements the
reference-as-oracle parity suite with an end-to-end run on real images
(accuracy-parity runs on FashionMNIST/CIFAR are data-blocked; see
experiments/real_digits_demo.py for the full-size version)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sklearn_datasets = pytest.importorskip("sklearn.datasets")

from dctn_tpu.data.feature_maps import apply_feature_map
from dctn_tpu.data.pipeline import calc_scaling_factor
from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.train import make_optimizer, make_train_step
from dctn_tpu.train.evaluation import make_score_fn


def test_digits_end_to_end_learns():
    digits = sklearn_datasets.load_digits()
    images = (digits.images / 16.0).astype(np.float64)
    labels = digits.target.astype(np.int32)
    order = np.random.RandomState(0).permutation(len(labels))
    images, labels = images[order], labels[order]

    x_all = apply_feature_map(images)
    nu = calc_scaling_factor(x_all[:, :600], kernel_size=3)
    assert 0.3 < nu < 1.5  # sane window scaling on real images
    x_all = (x_all.astype(np.float64) * nu).astype(np.float32)
    x_tr, y_tr = jnp.asarray(x_all[:, :600]), jnp.asarray(labels[:600])
    x_va, y_va = jnp.asarray(x_all[:, 600:900]), jnp.asarray(labels[600:900])

    cfg = EPSesPlusLinearConfig(epses_specs=((3, 4),), image_size=8, q0=2)
    params = init_eps_plus_linear(
        jax.random.PRNGKey(0), cfg, "unit_empirical_output_std", init_input=x_tr
    )
    opt = make_optimizer("adam", 3e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epswise", 1e-6, donate=False)
    score = make_score_fn(cfg, batch_size=128)

    rng = np.random.RandomState(1)
    key = jax.random.PRNGKey(2)
    n, bs = 600, 64
    perm, off = rng.permutation(n), 0
    for _ in range(150):
        if off + bs > n:
            perm, off = rng.permutation(n), 0
        idx = jnp.asarray(perm[off : off + bs])
        off += bs
        key, sub = jax.random.split(key)
        params, opt_state, m = step(
            params, opt_state, sub,
            jnp.take(x_tr, idx, axis=1), jnp.take(y_tr, idx, axis=0),
        )
    _, va = score(params, x_va, y_va)
    assert float(va) > 0.85, f"val acc {float(va)} on real digits"
