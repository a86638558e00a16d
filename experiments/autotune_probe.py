"""Run the empirical split autotuner (train/autotune.py) on the recorded
model families and record the per-candidate timings — does measurement
confirm the analytic cost model's picks, and by how much?

  PYTHONPATH=/root/repo:/root/.axon_site python experiments/autotune_probe.py [bs]

Writes autotune_probe_results.json: one entry per config with the full
candidate tables. The interesting config is the deep three-EPS family —
its (K=2, Q=12, O=24) layer is the one the pre-r3 split rule got wrong
(60.6 TF/s from a 144→256 MXU pad; docs/performance.md).
"""

from __future__ import annotations

import json
import os
import sys

# (specs, reg_type, reg_coeff) — the reg matters: the epses_composition
# recursion's kron sizes couple to the split, so the tuner charges each
# candidate its marginal reg cost (train/autotune.py). The flagship family
# trains with epswise L2 (split-independent); the deep replication config
# uses composition reg 1e-1 (three_epses_on_fashionmnist.py:36-37).
CONFIGS = {
    "two_eps_flagship": (((4, 4), (3, 6)), "epswise", 1e-6),
    "three_eps_deep": (((4, 4), (3, 12), (2, 24)), "epses_composition", 1e-1),
}

RESULTS = os.path.join(
    os.path.dirname(__file__), "autotune_probe_results.json"
)


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    from dctn_tpu.models import EPSesPlusLinearConfig
    from dctn_tpu.train.autotune import autotune_splits

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    results = {}
    if os.path.exists(RESULTS):
        results = json.load(open(RESULTS))
    for name, (specs, reg_type, reg_coeff) in CONFIGS.items():
        cfg = EPSesPlusLinearConfig(
            epses_specs=specs, image_size=28, q0=2,
            train_backend="pallas", eval_backend="pallas",
        )
        plans, report = autotune_splits(
            cfg, bs, max_candidates=3,
            reg_type=reg_type, reg_coeff=reg_coeff,
            log_fn=lambda s: print(s, flush=True),
        )
        results[f"{name}_bs{bs}"] = {
            "device": str(jax.devices()[0]),
            "batch_size": bs,
            "reg_type": reg_type,
            "layers": report,
        }
        json.dump(results, open(RESULTS, "w"), indent=1)
    print("wrote", RESULTS)


if __name__ == "__main__":
    main()
