"""Replicate the reference's 90.19%-vacc FashionMNIST run (the BASELINE
parity gate): single EPS(4,4) + linear, manual init (eps std 0.25, linear
weight/bias U(±0.02)), φ multiplier ν=0.5, Adam lr=3e-3, bs=128, no reg
(reference small_experiments/replicate_90.19_vacc_experiment.py:7-40).

Needs real FashionMNIST IDX files under $DCTN_TPU_DATA (zero-egress
environments fall back to synthetic data, which exercises the pipeline but
cannot reproduce the accuracy).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dctn_tpu.cli.runner import run

ds_path = os.environ.get("DCTN_TPU_DATA", "synthetic")
if ds_path == "synthetic":
    print("WARNING: no $DCTN_TPU_DATA — running on synthetic data; the 90.19% "
          "accuracy target only applies to real FashionMNIST.")

state = run(
    experiments_dir=os.environ.get(
        "DCTN_TPU_EXPERIMENTS", "experiments_output/replicate_90.19_vacc"
    ),
    ds_type="fashionmnist",
    ds_path=ds_path,
    batch_size=128,
    optimizer_name="adam",
    epses_specs=((4, 4),),
    lr=3e-3,
    reg_type="epses_composition",
    reg_coeff=0.0,
    phi_multiplier=0.5,
    init_eps_zero_centered_normal_std=((0, 0.25),),
    init_linear_weight_zero_centered_uniform=0.02,
    init_linear_bias_zero_centered_uniform=0.02,
    max_num_iters=int(os.environ.get("DCTN_TPU_MAX_ITERS", "100000")),
)
print("stopped:", state.stop_reason, "at", state.num_iters_done, "iters")
