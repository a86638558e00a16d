"""Legacy ConvSBS model training-step benchmark: fused Pallas TT-fold
kernels vs the XLA chain-fold path, on the VERDICT-prescribed config
(num_sbs_layers=2, bond_dim_size=4). Appends JSON results like the
reference's micro-benchmark results.json files.

Measured on one v5e chip (recorded in conv_sbs_benchmark_results.json).
r5 default path (heuristic picks + the layer-0 dead-cotangent skip):
pallas 66.3k/70.9k img/s (bs 100/512 open), ring 25.5k — vs xla
7.6k/6.5k/2.2k. With the autotuned kernel picks applied
(`--autotune-kernels`, sbs_phase2_probe_results.json): 69.5k/96.3k open,
40.5k ring. History: r3 sequential fold 38.4k/40.2k/11.1k; r4 MIM
56.9k/70.3k/25.3k.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from dctn_tpu.models.conv_sbs_model import (
    ConvSBSModelConfig,
    init_conv_sbs_model,
    conv_sbs_model_forward,
)


def main() -> None:
    key = jax.random.PRNGKey(0)
    results = []
    backends = ["xla"]
    if jax.default_backend() == "tpu":
        backends.append("pallas")
    for backend in backends:
        for bs, trace_edge in ((100, False), (512, False), (100, True)):
            cfg = ConvSBSModelConfig(
                num_sbs_layers=2, bond_dim_size=4, backend=backend,
                trace_edge=trace_edge,
            )
            params = init_conv_sbs_model(key, cfg)
            opt = optax.sgd(1e-3)
            ostate = opt.init(params)
            x = jax.random.uniform(key, (bs, 28, 28))
            y = jax.random.randint(key, (bs,), 0, 10)

            @jax.jit
            def step(p, o):
                def loss_fn(pp):
                    logits = conv_sbs_model_forward(pp, cfg, x)
                    lp = jax.nn.log_softmax(logits)
                    return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))

                loss, grads = jax.value_and_grad(loss_fn)(p)
                up, o = opt.update(grads, o, p)
                return optax.apply_updates(p, up), o, loss

            p, o = params, ostate
            for _ in range(3):
                p, o, l = step(p, o)
            float(l)  # value fetch = the reliable sync on the axon backend
            # ~49k-image windows, best of 3: every fenced window costs a
            # fixed ~28 ms through the relay (docs/performance.md
            # measurement rules) — the old single 10-step window inflated
            # per-step readings by ~2.8 ms
            iters = max(10, 49152 // bs)
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    p, o, l = step(p, o)
                float(l)
                dt = min(dt, (time.perf_counter() - t0) / iters)
            r = {
                "kind": "legacy ConvSBS 2 layers bond 4 train step",
                "backend": backend,
                "trace_edge": trace_edge,
                "batch_size": bs,
                "ms_per_step": round(dt * 1e3, 3),
                "images_per_sec": round(bs / dt, 1),
                "device": str(jax.devices()[0]),
            }
            print(json.dumps(r), flush=True)
            results.append(r)
    out = os.path.join(
        os.path.dirname(__file__), "conv_sbs_benchmark_results.json"
    )
    existing = json.load(open(out)) if os.path.exists(out) else []
    with open(out, "w") as f:
        json.dump(existing + results, f, indent=1)


if __name__ == "__main__":
    main()
