"""Phase bisection of the flagship fast-cmt train step: forward-only vs
forward+backward vs full step (optimizer update included), measured with
long fenced windows (the ~28 ms/window relay constant amortized — see
docs/performance.md measurement rules).

Purpose: account for the step time that is NOT the four Pallas kernels.
The window-corrected kernel probe puts the kernels at ~48 ms of the
71.5 ms bs-2048 step; this probe attributes the rest (saved-t HBM write in
the forward, view-stack construction + its backward, classifier/loss/Adam).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/step_phase_probe.py [bs ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import optax

from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.models.eps_plus_linear import (
    eps_plus_linear_forward_fast,
    fast_params_from_reference,
)
from dctn_tpu.train import make_optimizer
from dctn_tpu.train.step import make_fast_reg_fn


def timed(call, fence, iters):
    call()  # compile
    fence()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            call()
        fence()
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    import ast
    import os

    bss = [int(a) for a in sys.argv[1:]] or [128, 2048]
    specs = ast.literal_eval(os.environ.get("PROBE_SPECS", "((4,4),(3,6))"))
    reg_name = os.environ.get("PROBE_REG", "epswise")
    reg_coeff = float(os.environ.get("PROBE_REG_COEFF", "1e-6"))
    for bs in bss:
        cfg = EPSesPlusLinearConfig(
            epses_specs=specs, image_size=28, q0=2,
            train_backend="pallas", eval_backend="pallas",
        )
        key = jax.random.PRNGKey(0)
        params = init_eps_plus_linear(key, cfg)
        fast, plans = fast_params_from_reference(params, cfg)
        reg_fn = make_fast_reg_fn(cfg, plans, reg_name)
        opt = make_optimizer("adam", 3e-3)
        x = jax.random.uniform(key, (1, bs, 28, 28, 2), jnp.float32) * 1.4
        y = jax.random.randint(key, (bs,), 0, 10)
        iters = max(16, 49152 // bs)

        def loss_fn(f, with_reg=True):
            logits = eps_plus_linear_forward_fast(
                f, x, cfg, plans, training=True, rng=jax.random.PRNGKey(1)
            )
            logp = jax.nn.log_softmax(logits, axis=1)
            ce = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
            return ce + (reg_coeff * reg_fn(f) if with_reg else 0.0)

        # (a0) fwd+loss WITHOUT the regularizer — isolates the reg's cost
        fwd0 = jax.jit(lambda f: loss_fn(f, with_reg=False))
        box0 = {}

        def run_fwd0():
            box0["l"] = fwd0(fast)

        t_fwd0 = timed(run_fwd0, lambda: float(box0["l"]), iters)
        vg0 = jax.jit(jax.value_and_grad(lambda f: loss_fn(f, with_reg=False)))

        def run_vg0():
            box0["l"], box0["g"] = vg0(fast)

        t_vg0 = timed(
            run_vg0,
            lambda: float(box0["l"])
            + float(jax.tree_util.tree_leaves(box0["g"])[0].ravel()[0]),
            iters,
        )
        print(
            f"bs {bs}: NO-REG fwd+loss {t_fwd0:7.3f} ms | fwd+bwd {t_vg0:7.3f} ms",
            flush=True,
        )

        # (a) forward + loss only (no saved-t write should survive DCE:
        # nothing consumes the residuals)
        fwd = jax.jit(loss_fn)
        box = {}

        def run_fwd():
            box["l"] = fwd(fast)

        t_fwd = timed(run_fwd, lambda: float(box["l"]), iters)

        # (b) forward + backward (grads materialized, no optimizer)
        vg = jax.jit(jax.value_and_grad(loss_fn))

        def run_vg():
            box["l"], box["g"] = vg(fast)

        t_vg = timed(
            run_vg,
            lambda: float(box["l"])
            + float(jax.tree_util.tree_leaves(box["g"])[0].ravel()[0]),
            iters,
        )

        # (c) full step (donated params/opt_state chain across iterations)
        ostate = opt.init(fast)

        from functools import partial

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(f, o):
            l, g = jax.value_and_grad(loss_fn)(f)
            upd, o = opt.update(g, o, f)
            return optax.apply_updates(f, upd), o, l

        st = {"f": fast, "o": ostate}

        def run_step():
            st["f"], st["o"], st["l"] = step(st["f"], st["o"])

        t_step = timed(run_step, lambda: float(st["l"]), iters)

        print(
            f"bs {bs}: fwd+loss {t_fwd:7.3f} ms | fwd+bwd {t_vg:7.3f} ms "
            f"| full step {t_step:7.3f} ms | bwd-only {t_vg - t_fwd:7.3f} "
            f"| adam {t_step - t_vg:7.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
