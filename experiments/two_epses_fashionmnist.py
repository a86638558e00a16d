"""Two EPSes (4,4),(3,6) + linear on FashionMNIST with ν=1.45646 — the config
family whose early-stopped checkpoint scored 88.20% val / 87.65% test
(reference pre_publishing_test_evaluation/two_epses_on_fashionmnist.py:46-47,
trained with Adam + epswise L2 — the 'adam_and_epswise_l2' family)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dctn_tpu.cli.runner import run

state = run(
    experiments_dir=os.environ.get(
        "DCTN_TPU_EXPERIMENTS", "experiments_output/two_epses_fashionmnist"
    ),
    ds_type="fashionmnist",
    ds_path=os.environ.get("DCTN_TPU_DATA", "synthetic"),
    batch_size=128,
    optimizer_name="adam",
    epses_specs=((4, 4), (3, 6)),
    lr=1.5e-3,
    reg_type="epswise",
    reg_coeff=1e-6,
    phi_multiplier=1.45646,
    init_epses_composition_unit_theoretical_output_std=True,
    max_num_iters=int(os.environ.get("DCTN_TPU_MAX_ITERS", "100000")),
)
print("stopped:", state.stop_reason, "at", state.num_iters_done, "iters")
