"""A probabilistic multilinear classifier trained entirely in log space —
capability parity with the reference's
``small_experiments/tiny_mnist_probabilistic_multilinear_classifier.py``
(the experiment logmatmulexp exists for): per-class log-probabilities are a
chain of log-space matmuls over per-pixel log-feature vectors, so every
intermediate stays a log-probability and never under/overflows.

Model: downsampled images → per-pixel φ' = log(φ/2) features → for each
class, log p(x|c) = Σ_pixels log(w_c,pixel · φ_pixel) computed via
logmatmulexp chains; trained with CE on the log-joint. Uses the fused Pallas
kernel on TPU.

Run: python experiments/log_space_classifier.py  (synthetic by default)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dctn_tpu.data import io as data_io
from dctn_tpu.ops.logmatmulexp import logmatmulexp

DOWN = 4  # 28→7 downsample, 49 pixels
NUM_CLASSES = 10
STEPS = int(os.environ.get("DCTN_TPU_MAX_ITERS", "600"))


def features(x):
    """(B, 28, 28) → log-features (B, P, 2) with P = 49."""
    b = x.shape[0]
    pooled = x.reshape(b, 7, DOWN, 7, DOWN).mean(axis=(2, 4))
    phi = jnp.stack(
        (jnp.sin(pooled * jnp.pi / 2) ** 2, jnp.cos(pooled * jnp.pi / 2) ** 2),
        axis=-1,
    )
    return jnp.log(jnp.clip(phi, 1e-6)).reshape(b, 49, 2)


def log_joint(log_w, log_feats):
    """log p(x, c) for every class via a log-space contraction chain.

    log_w: (P, C, 2) per-pixel per-class log-weights. For each pixel,
    logmatmulexp(batch log-features (B, 2), log_w[p].T (2, C)) gives
    log(features·w) per class; the per-pixel results ADD in log space
    (product of per-pixel factors)."""
    def body(carry, inp):
        lw_p, lf_p = inp  # (C, 2), (B, 2)
        contrib = logmatmulexp(lf_p, lw_p.T)  # (B, C)
        return carry + contrib, None

    b = log_feats.shape[0]
    init = jnp.zeros((b, NUM_CLASSES), log_feats.dtype)
    out, _ = jax.lax.scan(
        body, init, (log_w, jnp.moveaxis(log_feats, 1, 0))
    )
    return out


def main() -> None:
    x, y = data_io.synthetic_mnist_like(4096, seed=1234)
    xv, yv = data_io.synthetic_mnist_like(1024, seed=1234, offset=4096)
    x, y = jnp.asarray(x), jnp.asarray(y)
    xv, yv = jnp.asarray(xv), jnp.asarray(yv)

    key = jax.random.PRNGKey(0)
    log_w = jnp.log(
        jax.random.uniform(key, (49, NUM_CLASSES, 2), minval=0.3, maxval=1.0)
    )
    opt = optax.adam(3e-2)
    opt_state = opt.init(log_w)
    lf = features(x)
    lfv = features(xv)

    @jax.jit
    def step(w, s, idx):
        def loss_fn(w):
            logits = log_joint(w, lf[idx])
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, y[idx][:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(w)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(w, updates), s, loss

    @jax.jit
    def accuracy(w):
        logits = log_joint(w, lfv)
        return jnp.mean((jnp.argmax(logits, 1) == yv).astype(jnp.float32))

    rng = np.random.default_rng(0)
    print(f"initial val acc: {float(accuracy(log_w)):.2%}", flush=True)
    for i in range(STEPS):
        idx = jnp.asarray(rng.integers(0, x.shape[0], 256))
        log_w, opt_state, loss = step(log_w, opt_state, idx)
        if (i + 1) % 200 == 0:
            print(
                f"step {i+1}: loss={float(loss):.4f} "
                f"val acc={float(accuracy(log_w)):.2%}",
                flush=True,
            )
    final = float(accuracy(log_w))
    print(f"final val acc: {final:.2%} (chance = 10%)")
    assert bool(jnp.all(jnp.isfinite(log_w))), "log-space training stayed finite"


if __name__ == "__main__":
    main()
