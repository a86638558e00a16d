"""Validate measured --grad-accum-steps auto on the deep three-EPS config
(VERDICT r4 #5).

The cap model picks the SMALLEST accumulation whose saved-t buffers fit
(deep-3 at bs 2048 → 2, measured 12.62k img/s), but accum 4 measures
12.84k (three_epses_benchmark_results.json). The r5 `autotune_grad_accum`
times the candidates (cap·2^k) with the split autotuner's machinery and
takes the winner. This probe runs the REAL resolution path on the chip:
cap pick → measured pick, and records both.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/grad_accum_auto_probe.py
Writes experiments/grad_accum_auto_probe_results.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

SPECS = ((4, 4), (3, 12), (2, 24))  # the deep config (SURVEY baselines)
BS = 2048


def main() -> None:
    assert jax.default_backend() == "tpu", "needs the chip"
    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
    from dctn_tpu.cli.runner import _resolve_auto_grad_accum
    from dctn_tpu.train.autotune import autotune_grad_accum

    cfg = EPSesPlusLinearConfig(
        epses_specs=SPECS, image_size=28, q0=2,
        train_backend="pallas", eval_backend="pallas",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    _, plans = fast_params_from_reference(params, cfg)
    cap = _resolve_auto_grad_accum(cfg, plans, BS)
    print(f"cap-model pick: {cap}", flush=True)
    logs = []

    def log(s):
        logs.append(s)
        print(f"  {s}", flush=True)

    pick = autotune_grad_accum(
        cfg, plans, BS, cap_pick=cap, log_fn=log, cache_path=None
    )
    out = {
        "config": f"deep three-EPS {list(map(list, SPECS))} bs {BS}",
        "device": str(jax.devices()[0]),
        "cap_model_pick": cap,
        "measured_pick": pick,
        "log": logs,
        "recorded_step_benchmarks": {
            "accum_2_img_per_s": 12620,
            "accum_4_img_per_s": 12840,
            "source": "three_epses_benchmark_results.json (r4)",
        },
    }
    print(json.dumps({k: v for k, v in out.items() if k != "log"}, indent=1))
    path = os.path.join(
        os.path.dirname(__file__), "grad_accum_auto_probe_results.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
