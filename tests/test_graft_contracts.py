"""Driver contracts: entry() compile-checks and dryrun_multichip runs the
full DP training step on the virtual mesh (regression guard for the files the
round driver executes)."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)
    assert bool(jax.numpy.all(jax.numpy.isfinite(out)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_with_locked_small_backend():
    """VERDICT r1 finding #1: the driver calls dryrun_multichip in a process
    whose backend is already initialized with ONE device (the axon TPU probe
    locks the platform). The dryrun must still pass, by re-executing the body
    in a fresh interpreter that selects the virtual CPU mesh first."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        "assert len(jax.devices()) == 1  # lock in a 1-device backend\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(4)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", child],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]


def test_bench_json_contract():
    """bench.py must print one JSON line with the required keys (measured on
    whatever backend the test host has; baseline skipped for speed)."""
    import json
    import subprocess

    env = dict(os.environ)
    env.update(
        BENCH_BATCH="16",
        BENCH_STEPS="2",
        BENCH_SKIP_TORCH_BASELINE="1",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")],
        capture_output=True, text=True, env=env, timeout=900,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, proc.stderr[-2000:]
    result = json.loads(lines[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(result)
    assert result["value"] > 0
    # self-describing roofline keys (values None off-TPU, but always present)
    assert {
        "xla_images_per_sec", "pallas_images_per_sec", "step_ms",
        "flops_per_step_xla", "bytes_per_step_xla", "xla_mfu_vs_bf16_peak",
        "xla_achieved_hbm_gbps", "device_kind",
    } <= set(result)
