"""Flagship training-step benchmark sweep → step_benchmark_results.json.

Measures the two-EPS (4,4),(3,6) FashionMNIST training step (CE + epswise
L2, Adam, donate=True) on the Pallas fast-cmt path across batch sizes and
compute dtypes, one row per config, using the same fenced best-of-3
methodology as bench.py. Run on the real chip:

  PYTHONPATH=/root/repo:/root/.axon_site python experiments/step_benchmark.py [bs ...]

Writes/merges experiments/step_benchmark_results.json so partial runs
(relay flakiness) accumulate.
"""

from __future__ import annotations

import json
import os
import sys
import time

RESULTS = os.environ.get(
    "SWEEP_RESULTS",
    os.path.join(os.path.dirname(__file__), "step_benchmark_results.json"),
)


def measure(
    batch_size: int, compute_dtype: str, steps: int, grad_accum: int = 1,
    splits=None, qat=None,
) -> dict:
    import jax
    import jax.numpy as jnp

    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
    from dctn_tpu.train import make_optimizer
    from dctn_tpu.train.step import make_fast_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=((4, 4), (3, 6)),
        image_size=28,
        q0=2,
        compute_dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        train_backend="pallas",
        eval_backend="pallas",
    )
    key = jax.random.PRNGKey(0)
    params = init_eps_plus_linear(key, cfg)
    params, plans = fast_params_from_reference(params, cfg)
    if splits is not None:  # autotuned matmul splits (train/autotune.py)
        plans = tuple({**p, "n1": n1} for p, n1 in zip(plans, splits))
        params, plans = fast_params_from_reference(
            init_eps_plus_linear(key, cfg), cfg, plans=plans
        )
    opt = make_optimizer("adam", 3e-3)
    step = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-6, donate=True,
        grad_accum_steps=grad_accum, qat=qat,
    )
    opt_state = opt.init(params)
    x = jax.random.uniform(key, (1, batch_size, 28, 28, 2), jnp.float32) * 1.4
    y = jax.random.randint(key, (batch_size,), 0, 10)
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, rng, x, y)
    float(m["loss"])  # fence (relay: only value fetches synchronize)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, m = step(params, opt_state, rng, x, y)
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    row = {
        "batch_size": batch_size,
        "compute_dtype": compute_dtype,
        "images_per_sec": round(batch_size * steps / best, 1),
        "step_ms": round(best / steps * 1e3, 3),
        "path": "pallas_fast_cmt",
    }
    if grad_accum != 1:
        row["grad_accum"] = grad_accum
    if splits is not None:
        row["splits"] = list(splits)
        row["path"] = "pallas_fast_cmt_tuned_splits"
    if qat is not None:
        row["qat"] = qat
        row["path"] += "_qat_" + qat
    return row


def main() -> None:
    import jax

    batches = [int(a) for a in sys.argv[1:]] or [128, 2048]
    dtypes = os.environ.get("SWEEP_DTYPES", "float32,bfloat16").split(",")
    accum = int(os.environ.get("SWEEP_ACCUM", "1"))
    # SWEEP_SPLITS="10,6": per-layer autotuned n1 picks (default: cost model)
    splits_env = os.environ.get("SWEEP_SPLITS", "")
    splits = tuple(int(v) for v in splits_env.split(",")) if splits_env else None
    # SWEEP_QAT=int8: the W8A8 STE training step (--qat int8)
    qat = os.environ.get("SWEEP_QAT") or None
    rows = []
    if os.path.exists(RESULTS):
        rows = json.load(open(RESULTS))["rows"]
    done = {
        (r["batch_size"], r["compute_dtype"], r.get("grad_accum", 1),
         tuple(r.get("splits", ())), r.get("qat")) for r in rows
    }
    for bs in batches:
        for dt in dtypes:
            if (bs, dt, accum, tuple(splits or ()), qat) in done:
                continue
            # ~49k-image windows (~1.7 s): the relay fence costs a fixed
            # ~28 ms per window, which at short windows inflates per-step
            # time (at bs 128 × 30 steps it read +0.9 ms/step — the phantom
            # "bs-128 gap", see docs/performance.md measurement rules)
            steps = max(4, min(512, 49152 // bs))
            row = measure(bs, dt, steps, accum, splits, qat)
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(RESULTS, "w") as f:
                json.dump(
                    {
                        "device_kind": jax.devices()[0].device_kind,
                        "config": "two_eps_(4,4),(3,6)_fashionmnist_adam_epswise",
                        "rows": rows,
                    },
                    f,
                    indent=1,
                )


if __name__ == "__main__":
    main()
