"""Hard-kill (SIGKILL) recovery — the NO-grace-window failure mode.

test_preemption.py covers the graceful path (SIGTERM → finish the step,
save, stop). Real fleets also fail HARD: OOM kills, host crashes, power
events — no signal handler runs. The contract (docs/multihost.md) is that
the eval-schedule `train_state_latest.npz` bounds the loss to one eval
interval, which requires two properties this test exercises for real:

1. ATOMICITY — `save_pytree`/`AsyncWriter` write tmp + `os.replace`
   (train/checkpoint.py:39-42,80-83), so a kill mid-write can never leave a
   corrupt latest-state file, only a stale one (plus a dangling .tmp).
2. RESUMABILITY — the surviving state resumes into a fresh process and
   continues to completion from the saved step.

A trainer subprocess is SIGKILLed mid-training (no cooperation possible),
then the run is resumed in-process from whatever state file survived.

The reference has nothing here: a crash loses the optimizer state and the
step position entirely (SURVEY §5 failure detection: NONE; manual
`--load-model-state` of weights only, new_runner.py:130,432-433).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
from dctn_tpu.cli.runner import run
run(
    experiments_dir={outdir!r},
    ds_type="mnist",
    ds_path="synthetic",
    epses_specs=((2, 4),),
    batch_size=32,
    optimizer_name="adam",
    lr=3e-3,
    init_epses_composition_unit_theoretical_output_std=True,
    eval_schedule=((None, 5),),
    max_num_iters=100000,
    keep_last_models=1,
    synthetic_sizes=(128, 64, 64),
    patience=100000,
)
"""


def test_sigkill_mid_training_resumes_from_last_eval_save(tmp_path):
    outdir = str(tmp_path / "victim")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD.format(outdir=outdir)],
        env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
    )
    try:
        # wait until at least one eval-schedule state save landed, then let
        # it train a bit PAST the save so the kill point is mid-interval
        state_file, saved_step = None, 0
        deadline = time.time() + 420
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    "trainer exited early: " + proc.stderr.read()[-3000:]
                )
            for sub in os.listdir(outdir) if os.path.isdir(outdir) else []:
                cand = os.path.join(outdir, sub, "train_state_latest.npz")
                if os.path.exists(cand):
                    try:
                        with np.load(cand) as d:
                            step = int(d["step"])
                    except Exception:
                        continue  # racing the writer; atomic replace will land
                    if step >= 10:
                        state_file, saved_step = cand, step
            if state_file:
                break
            time.sleep(0.5)
        assert state_file, "no train state appeared within the deadline"
        time.sleep(0.7)  # drift into the next eval interval: kill is mid-step
        proc.send_signal(signal.SIGKILL)  # no handler runs, no grace
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    # the surviving latest-state file is LOADABLE (atomic replace — never a
    # torn write) and records some eval-schedule step
    with np.load(state_file) as d:
        saved_step = int(d["step"])
    assert saved_step >= 10 and saved_step % 5 == 0

    # resume in-process and run to completion from the saved step
    from dctn_tpu.cli.runner import run

    state = run(
        experiments_dir=str(tmp_path / "resumed"),
        ds_type="mnist",
        ds_path="synthetic",
        epses_specs=((2, 4),),
        batch_size=32,
        optimizer_name="adam",
        lr=3e-3,
        init_epses_composition_unit_theoretical_output_std=True,
        eval_schedule=((None, 5),),
        max_num_iters=saved_step + 15,
        keep_last_models=1,
        synthetic_sizes=(128, 64, 64),
        patience=100000,
        resume_from=state_file,
    )
    assert state.stop_reason == "max_iters"
    assert state.num_iters_done == saved_step + 15
