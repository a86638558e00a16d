"""logmatmulexp vs plain matmul: chain of 6 over 256×256 f32 — mirrors the
reference's ``small_experiments/logmatmulexp_benchmark`` (GTX 1070: log-space
165× slower forward). Compares plain matmul, the jnp max-shift form, the
checkpointed variant, and the fused Pallas kernel; appends JSON results."""

import json
import os
import sys
from functools import reduce

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dctn_tpu.ops.logmatmulexp import logmatmulexp, logmatmulexp_lowmem
from dctn_tpu.pallas.logmatmulexp_pallas import logmatmulexp_pallas
from dctn_tpu.utils.benchmark import benchmark_jax

SIZE = 256
CHAIN = 6


def main() -> None:
    key = jax.random.PRNGKey(0)
    mats = [
        jax.random.normal(jax.random.fold_in(key, i), (SIZE, SIZE), jnp.float32)
        for i in range(CHAIN)
    ]
    on_tpu = jax.devices()[0].platform != "cpu"

    variants = {
        "matmul": lambda *ms: reduce(jnp.matmul, ms),
        "logmatmulexp": lambda *ms: reduce(logmatmulexp, ms),
        "logmatmulexp_lowmem": lambda *ms: reduce(logmatmulexp_lowmem, ms),
        "logmatmulexp_pallas": lambda *ms: reduce(
            lambda a, b: logmatmulexp_pallas(a, b, not on_tpu), ms
        ),
    }
    results = []
    for name, fn in variants.items():
        r = benchmark_jax(fn, mats, num_iterations=20, grad_argnums=tuple(range(CHAIN)))
        r.update(
            {
                "function": name,
                "size": SIZE,
                "chain": CHAIN,
                "device": str(jax.devices()[0]),
            }
        )
        print(json.dumps(r), flush=True)
        results.append(r)
    ratio = results[1]["forward_seconds_per_iteration"] / results[0][
        "forward_seconds_per_iteration"
    ]
    ratio_p = results[3]["forward_seconds_per_iteration"] / results[0][
        "forward_seconds_per_iteration"
    ]
    print(f"log-space / matmul forward: jnp {ratio:.1f}x, pallas {ratio_p:.1f}x "
          f"(reference GPU baseline: ~165x)")
    out = os.path.join(os.path.dirname(__file__), "logmatmulexp_benchmark_results.json")
    existing = json.load(open(out)) if os.path.exists(out) else []
    with open(out, "w") as f:
        json.dump(existing + results, f, indent=1)


if __name__ == "__main__":
    main()
