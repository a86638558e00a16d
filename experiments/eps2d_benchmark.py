"""EPS kernel micro-benchmark across contraction split choices — the analog
of reference ``small_experiments/eps2d_benchmark`` (which compared opt_einsum
paths; here the knob is the Khatri-Rao half-split point and the custom-VJP
toggle). Appends JSON results like the reference's results.json."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dctn_tpu.ops import eps as E
from dctn_tpu.utils.benchmark import benchmark_jax


def main() -> None:
    key = jax.random.PRNGKey(0)
    batch_size = int(os.environ.get("BENCH_BATCH", "64"))
    x = jax.random.uniform(key, (1, batch_size, 28, 28, 2), jnp.float32)
    core = E.make_eps_unit_theoretical_output_std(key, 4, 1, 2, 4)
    results = []
    for split in (4, 8, 10, None):
        for custom in (True, False):
            fn = lambda c, xx: E.eps(c, xx, split=split, custom_vjp=custom)
            r = benchmark_jax(fn, (core, x), num_iterations=10)
            r.update(
                {
                    "kind": "eps K=4 Q=2 O=4",
                    "batch_size": batch_size,
                    "split": split,
                    "custom_vjp": custom,
                    "device": str(jax.devices()[0]),
                }
            )
            print(json.dumps(r), flush=True)
            results.append(r)
    out = os.path.join(os.path.dirname(__file__), "eps2d_benchmark_results.json")
    existing = json.load(open(out)) if os.path.exists(out) else []
    # merge by key so re-runs refresh rows instead of duplicating them
    keyf = lambda r: (r["kind"], r["batch_size"], r["split"], r["custom_vjp"])
    merged = {keyf(r): r for r in existing + results}
    with open(out, "w") as f:
        json.dump(list(merged.values()), f, indent=1)


if __name__ == "__main__":
    main()
