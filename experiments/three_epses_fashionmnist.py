"""Three EPSes (4,4),(3,12),(2,24) + linear on FashionMNIST — the deep config
(77.08% val / 75.94% test in the reference, lr=1e-7, composition reg λ=1e-1;
pre_publishing_test_evaluation/three_epses_on_fashionmnist.py:36-37)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dctn_tpu.cli.runner import run

state = run(
    experiments_dir=os.environ.get(
        "DCTN_TPU_EXPERIMENTS", "experiments_output/three_epses_fashionmnist"
    ),
    ds_type="fashionmnist",
    ds_path=os.environ.get("DCTN_TPU_DATA", "synthetic"),
    batch_size=128,
    optimizer_name="adam",
    epses_specs=((4, 4), (3, 12), (2, 24)),
    lr=1e-7,
    reg_type="epses_composition",
    reg_coeff=1e-1,
    init_epses_composition_unit_empirical_output_std=True,
    max_num_iters=int(os.environ.get("DCTN_TPU_MAX_ITERS", "100000")),
)
print("stopped:", state.stop_reason, "at", state.num_iters_done, "iters")
