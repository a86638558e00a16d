"""MIM phase 2 (VERDICT r4 #3/#4): measure the r5 ConvSBS backward-tail
and tiling knobs on the real chip, per benchmark config.

Stages, per config (open bs 100, open bs 512, trace_edge ring bs 100),
full legacy-model training step (2 layers, bond 4, SGD — the
conv_sbs_benchmark.py program):

  dv_skip       — current defaults: layer 0 skips its dead d_views sweep
                  (need_dviews=False — the quantum map has no trained
                  params). The r4 baselines WITH that sweep are the recorded
                  conv_sbs_benchmark_results.json rows (1.76/7.28/3.95 ms).
  +autotune     — dv_skip + the measured (bn, mcut, dcore_dot, mim) picks
                  from train/autotune.autotune_conv_sbs (training objective)

Writes experiments/sbs_phase2_probe_results.json. Measurement: fenced
value-fetch windows ≥ ~1 s device time (docs/performance.md rules).
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
from dctn_tpu.train.autotune import autotune_conv_sbs
from dctn_tpu.utils.benchmark import _timed_window


def measure_step(cfg, bs, key):
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
    box = {}

    def call():
        nonlocal p, o
        p, o, box["l"] = step(p, o)
        return box["l"]

    call()
    float(box["l"])  # fence warmup
    iters, best = 16, float("inf")
    for _ in range(3):
        s_per_iter, iters = _timed_window(call, iters)
        best = min(best, s_per_iter)
    return best * 1e3


def main() -> None:
    assert jax.default_backend() == "tpu", "phase-2 probe needs the chip"
    key = jax.random.PRNGKey(0)
    results = []
    for bs, trace_edge in ((100, False), (512, False), (100, True)):
        name = f"{'ring' if trace_edge else 'open'}_bs{bs}"
        base_kw = dict(
            num_sbs_layers=2, bond_dim_size=4, backend="pallas",
            trace_edge=trace_edge,
        )
        cfg = ConvSBSModelConfig(**base_kw)

        t0 = time.perf_counter()
        ms_dv = measure_step(cfg, bs, key)
        print(f"{name}: dv_skip {ms_dv:.3f} ms "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

        tuning, report = autotune_conv_sbs(
            cfg, 28, bs, log_fn=lambda s: print(f"  {s}", flush=True),
            cache_path=os.environ.get("DCTN_TPU_AUTOTUNE_CACHE") or None,
        )
        ms_tuned = ms_dv
        if any(p for p in tuning):
            cfg_t = ConvSBSModelConfig(**base_kw, kernel_tuning=tuning)
            ms_tuned = measure_step(cfg_t, bs, key)
            print(f"{name}: tuned {tuning} -> {ms_tuned:.3f} ms", flush=True)
        else:
            print(f"{name}: heuristics won everywhere", flush=True)

        results.append({
            "config": name, "batch": bs, "trace_edge": trace_edge,
            "dv_skip_ms": round(ms_dv, 3),
            "tuned_ms": round(ms_tuned, 3),
            "tuning": [list(p) if p else None for p in tuning],
            "img_per_s": round(bs / (min(ms_dv, ms_tuned) / 1e3)),
            "autotune_report": report,
        })

    out = {
        "device": str(jax.devices()[0]),
        "note": "r4 baselines (layer-0 d_views still computed): open bs100 "
                "1.76 ms / open bs512 7.28 / ring bs100 3.95 "
                "(conv_sbs_benchmark_results.json)",
        "results": results,
    }
    path = os.path.join(
        os.path.dirname(__file__), "sbs_phase2_probe_results.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
