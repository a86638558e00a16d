"""Per-layer phase bisection of the three-EPS (4,4),(3,12),(2,24) deep
config: times each EPS layer's Pallas forward and forward+backward in
isolation (long fenced windows, docs/performance.md measurement rules),
prints the implied TF/s per pass against the 197 TF/s bf16 peak, and the
resolved plan (bn, saved-t decision, o-tiling) per layer.

Purpose: attribute the gap between the measured 14.6 ms bs-128 step
(experiments/three_epses_benchmark_results.json) and the ~9.8 ms flop floor
at the flagship kernels' 165 TF/s efficiency.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/three_eps_layer_probe.py [bs]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
from dctn_tpu.pallas.eps_pallas import (
    _kernel_dims,
    _save_t_plan,
    eps_pallas_apply_t_cmt,
    plan_pallas_call,
)

SPECS = ((4, 4), (3, 12), (2, 24))


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
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = EPSesPlusLinearConfig(
        epses_specs=SPECS, image_size=28, q0=2,
        train_backend="pallas", eval_backend="pallas",
    )
    key = jax.random.PRNGKey(0)
    params = init_eps_plus_linear(key, cfg)
    fast, plans = fast_params_from_reference(params, cfg)

    # build each layer's input: run the pipeline forward on host of layers
    x = jax.random.uniform(key, (1, bs, 28, 28, 2), jnp.float32) * 1.4
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))  # (C, Q, H, W, B)

    ch, qq, hh, ww = 1, 2, 28, 28
    total_fwd = total_step = 0.0
    for i, (cmt, p) in enumerate(zip(fast["epses_cmt"], plans)):
        k_, out_size = p["kernel_size"], p["out_size"]
        hp, wp = hh - k_ + 1, ww - k_ + 1
        npix = bs * hp * wp
        n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
            ch, qq, k_, p["n1"], out_size, npix, cfg.compute_dtype, False
        )
        n_k, q_k, n1_k = _kernel_dims(ch, qq, k_, n1, merge_pairs)
        npad = -(-npix // bn) * bn
        save = _save_t_plan(n_k, n1_k, q_k, out_size, bn, mm_dtype, npad,
                            i == 0)
        a, z = q_k**n1_k, q_k ** (n_k - n1_k) * out_size
        gflop_pass = 2 * a * z * npix / 1e9  # one MXU pass over all pixels

    # passes: fwd=1; bwd: layer0 d_core only =1; saved-t two_t: d_core +
    # d_views(no recompute) = 2; fused (no saved t): recompute+d_core+d_views=3
        if i == 0:
            bwd_passes = 1
        elif save is not None:
            bwd_passes = 2
        else:
            bwd_passes = 3

        args = (out_size, k_, n1, bn, False, mm_dtype, merge_pairs, i == 0)

        def fwd_loss(cmt_, xT_, _a=args):
            return jnp.sum(eps_pallas_apply_t_cmt(cmt_, xT_, *_a))

        jf = jax.jit(fwd_loss)
        # grad w.r.t. the input too for i>0 — otherwise XLA DCEs the
        # separate d_views pallas_call on the two-pass/two_t arms and the
        # bwd_passes accounting below would credit a pass that never ran
        jg = jax.jit(
            jax.value_and_grad(fwd_loss, argnums=0 if i == 0 else (0, 1))
        )
        box = {}
        iters = max(16, int(3.5e6 // gflop_pass) if gflop_pass else 64)
        iters = min(iters, 768)

        def run_f(cmt_=cmt, xT_=xT):
            box["l"] = jf(cmt_, xT_)

        def run_g(cmt_=cmt, xT_=xT):
            box["l"], box["g"] = jg(cmt_, xT_)

        t_f = timed(run_f, lambda: float(box["l"]), iters)
        t_g = timed(
            run_g,
            lambda: float(box["l"])
            + float(jax.tree_util.tree_leaves(box["g"])[0].ravel()[0]),
            iters,
        )
        tf_f = gflop_pass / t_f  # GF / ms = TF/s
        tf_b = gflop_pass * bwd_passes / max(t_g - t_f, 1e-9)
        total_fwd += t_f
        total_step += t_g
        print(
            f"L{i} K={k_} q={qq}->o={out_size} a={a} z={z} bn={bn} "
            f"save_t={save} pix={npix}\n"
            f"   fwd {t_f:7.3f} ms ({tf_f:6.1f} TF/s) | fwd+bwd {t_g:7.3f} ms "
            f"| bwd-only {t_g - t_f:7.3f} ms ({bwd_passes} passes, "
            f"{tf_b:6.1f} TF/s)",
            flush=True,
        )

        # advance to next layer's input
        outT = eps_pallas_apply_t_cmt(cmt, xT, *args)
        xT = outT[None]
        ch, qq, hh, ww = 1, out_size, hp, wp

    print(f"sum of layer fwd {total_fwd:.3f} ms | sum fwd+bwd {total_step:.3f} ms")


if __name__ == "__main__":
    main()
