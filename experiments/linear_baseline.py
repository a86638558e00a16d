"""Linear-classifier baseline on flattened quantum features — the analog of
the reference's sklearn CIFAR-10 baseline (README.org:68: 41.73% vacc), so
EPS configs can be compared against the no-tensor-network floor.

Run: python experiments/linear_baseline.py --ds-type cifar10_YCbCr \
         --ds-path /data/cifar10   (synthetic by default)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import click
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dctn_tpu.data import load_dataset


@click.command()
@click.option("--ds-type", default="cifar10_YCbCr")
@click.option("--ds-path", default="synthetic")
@click.option("--steps", type=int, default=2000)
@click.option("--lr", type=float, default=1e-2)
@click.option("--weight-decay", type=float, default=1e-4)
def main(ds_type, ds_path, steps, lr, weight_decay):
    colored = ds_type in ("cifar10_rgb", "cifar10_YCbCr")
    splits = load_dataset(
        ds_type,
        ds_path,
        center_and_normalize_each_channel=colored,
        nu_per_channel=(1.0, 1.0, 1.0) if colored else None,
        phi_multiplier=None if colored else 2.0,
        synthetic_sizes=(8192, 2048, 2048),
    )
    def flat(split):
        return jnp.asarray(split.x.reshape(split.x.shape[1], -1))

    x_tr, y_tr = flat(splits.train), jnp.asarray(splits.train.y)
    x_val, y_val = flat(splits.val), jnp.asarray(splits.val.y)
    d = x_tr.shape[1]
    params = {
        "w": jnp.zeros((d, 10), jnp.float32),
        "b": jnp.zeros((10,), jnp.float32),
    }
    opt = optax.chain(optax.add_decayed_weights(weight_decay), optax.adam(lr))
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, idx):
        def loss_fn(p):
            logits = x_tr[idx] @ p["w"] + p["b"]
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, y_tr[idx][:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def acc(p, x, y):
        return jnp.mean((jnp.argmax(x @ p["w"] + p["b"], 1) == y).astype(jnp.float32))

    rng = np.random.default_rng(0)
    for i in range(steps):
        idx = jnp.asarray(rng.integers(0, x_tr.shape[0], 256))
        params, opt_state, loss = step(params, opt_state, idx)
    print(
        f"linear baseline: train acc={float(acc(params, x_tr, y_tr)):.2%} "
        f"val acc={float(acc(params, x_val, y_val)):.2%} "
        f"(reference CIFAR-10 sklearn baseline: 41.73% vacc)"
    )


if __name__ == "__main__":
    main()
