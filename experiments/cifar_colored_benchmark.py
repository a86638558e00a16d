"""CIFAR-colored (C=3) EPS training-step throughput on one chip.

The reference's colored-CIFAR family (README.org:74-77, BASELINE configs)
trains EPS(K=2, Q_out∈{6,12,24})+linear on 3-channel YCbCr 32×32 inputs —
the first EPS contracts K²·C = 12 quantum factors per window. This
benchmark measures that family's training step (CE + epswise L2, Adam) on
synthetic data with both backends, extending the measured-throughput
evidence beyond the FashionMNIST flagship. (K=3 C=3 is excluded: its dense
core is 2^27·6 elements ≈ 3.2 GB — the reference's own K=3 colored runs
used it only at small scale.)

Appends JSON rows like the other experiments' results files.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.train import make_optimizer, make_train_step


def main() -> None:
    key = jax.random.PRNGKey(0)
    results = []
    backends = ["xla"]
    if jax.default_backend() == "tpu":
        backends.append("pallas")
    for backend in backends:
        for q_out, bs in ((24, 128), (24, 512), (12, 512)):
            cfg = EPSesPlusLinearConfig(
                epses_specs=((2, q_out),), image_size=32, q0=2,
                train_backend=backend, eval_backend=backend,
            )
            # 3-channel quantum input (YCbCr after phi), synthetic values
            x = jax.random.uniform(key, (3, bs, 32, 32, 2), jnp.float32) * 1.4
            y = jax.random.randint(key, (bs,), 0, 10)
            # colored cores carry K²·C input dims — built by the empirical
            # (data-dependent) init, which infers C from the init input like
            # the runner's colored path
            params = init_eps_plus_linear(
                key, cfg, "unit_empirical_output_std", init_input=x[:, :128]
            )
            opt = make_optimizer("adam", 3e-4)
            ostate = opt.init(params)
            step = make_train_step(cfg, opt, "epswise", 1e-6, donate=True)

            p, o = params, ostate
            for _ in range(3):
                p, o, m = step(p, o, key, x, y)
            float(m["loss"])  # value fetch = the reliable fence on axon
            # ~49k-image windows, best of 3 (fixed ~28 ms per fenced
            # window through the relay — docs/performance.md)
            iters = max(40, 49152 // bs)
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    p, o, m = step(p, o, key, x, y)
                float(m["loss"])
                dt = min(dt, (time.perf_counter() - t0) / iters)
            r = {
                "kind": f"CIFAR-colored EPS(2,{q_out})+linear train step (C=3, 32x32)",
                "backend": backend,
                "batch_size": bs,
                "ms_per_step": round(dt * 1e3, 3),
                "images_per_sec": round(bs / dt, 1),
                "device": str(jax.devices()[0]),
            }
            print(json.dumps(r), flush=True)
            results.append(r)
    out = os.path.join(
        os.path.dirname(__file__), "cifar_colored_benchmark_results.json"
    )
    existing = json.load(open(out)) if os.path.exists(out) else []
    # merge by key so re-runs refresh rows instead of duplicating them
    keyf = lambda r: (r["kind"], r["backend"], r["batch_size"])
    merged = {keyf(r): r for r in existing + results}
    with open(out, "w") as f:
        json.dump(list(merged.values()), f, indent=1)


if __name__ == "__main__":
    main()
