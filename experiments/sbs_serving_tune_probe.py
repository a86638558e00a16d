"""ConvSBS SERVING with autotuned kernel picks (r5 follow-up to the
phase-2 training probe): the forward-only objective can prefer different
(bn, mcut) than training (no backward in the denominator), and the r4
serving numbers (193k open / 76k ring img/s at bs 100) predate the
merge-cut walk. Measures the legacy model's forward at bs 100, heuristic
vs serving-tuned picks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/sbs_serving_tune_probe.py
Writes experiments/sbs_serving_tune_probe_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dctn_tpu.models.conv_sbs_model import (
    ConvSBSModelConfig,
    init_conv_sbs_model,
    conv_sbs_model_forward,
)
from dctn_tpu.train.autotune import autotune_conv_sbs
from dctn_tpu.utils.benchmark import _timed_window


def measure_forward(cfg, bs, key):
    params = init_conv_sbs_model(key, cfg)
    x = jax.random.uniform(key, (bs, 28, 28))
    fwd = jax.jit(lambda p, xb: conv_sbs_model_forward(p, cfg, xb))
    box = {}

    def call():
        box["o"] = fwd(params, x)
        return box["o"]

    call()
    float(box["o"][0, 0])  # fence warmup
    iters, best = 64, float("inf")
    for _ in range(3):
        s_per_iter, iters = _timed_window(call, iters)
        best = min(best, s_per_iter)
    return best * 1e3


def main() -> None:
    assert jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(0)
    bs = 100
    results = []
    for trace_edge in (False, True):
        name = "ring" if trace_edge else "open"
        base_kw = dict(
            num_sbs_layers=2, bond_dim_size=4, backend="pallas",
            trace_edge=trace_edge,
        )
        cfg = ConvSBSModelConfig(**base_kw)
        ms_h = measure_forward(cfg, bs, key)
        print(f"{name}: heuristic fwd {ms_h:.3f} ms", flush=True)
        tuning, report = autotune_conv_sbs(
            cfg, 28, bs, forward_only=True,
            log_fn=lambda s: print(f"  {s}", flush=True),
        )
        ms_t = ms_h
        if any(p for p in tuning):
            cfg_t = ConvSBSModelConfig(**base_kw, kernel_tuning=tuning)
            ms_t = measure_forward(cfg_t, bs, key)
            print(f"{name}: tuned {tuning} fwd {ms_t:.3f} ms", flush=True)
        results.append({
            "config": name, "batch": bs,
            "heuristic_ms": round(ms_h, 3), "tuned_ms": round(ms_t, 3),
            "tuning": [list(p) if p else None for p in tuning],
            "img_per_s": round(bs / (min(ms_h, ms_t) / 1e3)),
        })
    out = {"device": str(jax.devices()[0]),
           "note": "forward-only (serving objective); r4 pipelined serving "
                   "rows: 193k open / 76.3k ring img/s "
                   "(serving_latency_results.json)",
           "results": results}
    path = os.path.join(
        os.path.dirname(__file__), "sbs_serving_tune_probe_results.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
