"""Is the bs-128 step dispatch-bound? Compare per-step time of
(a) host-dispatched steps (the step_benchmark.py method: async dispatch,
    one fence at the end) vs
(b) ONE dispatched program running K chained steps in a lax.fori_loop
    (device-side multi-step: no per-step host dispatch at all).

If (b) < (a) at bs 128, the remaining batch-independent ~0.8 ms/step is the
axon relay's per-dispatch cost, not program glue — and a multi-step train
loop recovers it.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/step_chain_probe.py [bs ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
from dctn_tpu.train import make_optimizer
from dctn_tpu.train.step import make_fast_train_step


def build(batch_size):
    cfg = EPSesPlusLinearConfig(
        epses_specs=((4, 4), (3, 6)), image_size=28, q0=2,
        train_backend="pallas", eval_backend="pallas",
    )
    key = jax.random.PRNGKey(0)
    params = init_eps_plus_linear(key, cfg)
    params, plans = fast_params_from_reference(params, cfg)
    opt = make_optimizer("adam", 3e-3)
    step = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-6, donate=True
    )
    x = jax.random.uniform(key, (1, batch_size, 28, 28, 2), jnp.float32) * 1.4
    y = jax.random.randint(key, (batch_size,), 0, 10)
    return cfg, plans, opt, step, params, opt.init(params), x, y


def host_dispatched(step, params, opt_state, x, y, iters):
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, rng, x, y)
    float(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, m = step(params, opt_state, rng, x, y)
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def device_chained(cfg, plans, opt, params, opt_state, x, y, iters):
    from dctn_tpu.train.step import REGULARIZERS, make_fast_reg_fn
    from dctn_tpu.models.eps_plus_linear import eps_plus_linear_forward_fast
    import optax

    reg_fn = make_fast_reg_fn(cfg, plans, "epswise")

    def loss_fn(fast, rng):
        logits = eps_plus_linear_forward_fast(
            fast, x, cfg, plans, training=True, rng=rng
        )
        logp = jax.nn.log_softmax(logits, axis=1)
        ce = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        return ce + 1e-6 * reg_fn(fast)

    @jax.jit
    def many(p, o, rng):
        def body(i, carry):
            p, o = carry
            l, g = jax.value_and_grad(loss_fn)(p, jax.random.fold_in(rng, i))
            upd, o = opt.update(g, o, p)
            return (optax.apply_updates(p, upd), o)

        p, o = jax.lax.fori_loop(0, iters, body, (p, o))
        return p, o

    p, o = many(params, opt_state, jax.random.PRNGKey(1))
    float(jax.tree_util.tree_leaves(p)[0].ravel()[0])  # fence compile+run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p, o = many(p, o, jax.random.PRNGKey(1))
        float(jax.tree_util.tree_leaves(p)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    bss = [int(a) for a in sys.argv[1:]] or [128, 2048]
    for bs in bss:
        iters = max(4, min(64, 4096 // bs * 4))
        cfg, plans, opt, step, params, opt_state, x, y = build(bs)
        a = host_dispatched(step, params, opt_state, x, y, iters)
        # donate=True consumed the buffers above — fresh ones for phase b
        cfg, plans, opt, step, params, opt_state, x, y = build(bs)
        b = device_chained(cfg, plans, opt, params, opt_state, x, y, iters)
        print(
            f"bs {bs}: host-dispatched {a:7.3f} ms/step | "
            f"device-chained {b:7.3f} ms/step | delta {a - b:+.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
