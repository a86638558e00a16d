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

    # On the axon host, any fresh interpreter's first BACKEND INIT dials the
    # relay — when the relay is down, ``jax.default_backend()`` hangs forever
    # regardless of JAX_PLATFORMS (``import jax`` alone still succeeds, so
    # probing the import is NOT enough), and bench.py cannot initialize.
    # Probe the backend and skip on outage (environmental, not a bench bug).
    probe_src = "import jax; print(jax.default_backend())"
    try:
        probe = subprocess.run(
            [sys.executable, "-c", probe_src],
            capture_output=True, timeout=120, env=dict(os.environ),
        )
        if probe.returncode != 0:
            pytest.skip("jax backend unavailable in subprocesses")
    except subprocess.TimeoutExpired:
        pytest.skip("axon relay down — fresh interpreters hang at backend init")

    env = dict(os.environ)
    env.update(
        BENCH_BATCH="16",
        BENCH_STEPS="2",
        BENCH_SKIP_TORCH_BASELINE="1",
        BENCH_PROBE_BUDGET_S="120",
        JAX_PLATFORMS="cpu",
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py")],
            capture_output=True, text=True, env=env, timeout=900,
        )
    except subprocess.TimeoutExpired:
        # The relay can flap BETWEEN the probe above and the bench run (it
        # has gone down for hours mid-session): re-probe, and if the outage
        # is confirmed treat the hang as environmental, not a bench bug.
        try:
            reprobe = subprocess.run(
                [sys.executable, "-c", probe_src],
                capture_output=True, timeout=120, env=dict(os.environ),
            )
            if reprobe.returncode != 0:
                pytest.skip("axon relay flapped mid-test (re-probe failed)")
        except subprocess.TimeoutExpired:
            pytest.skip("axon relay flapped mid-test (re-probe hangs)")
        raise
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


def test_bench_backend_probe(monkeypatch):
    """_wait_for_backend returns immediately on a responsive backend, retries
    through timeouts, and gives up after the budget (never hangs the driver's
    benchmark run on a relay outage)."""
    import subprocess
    import types

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    calls = []

    def fake_run(*args, **kwargs):
        calls.append(1)
        if len(calls) < 2:
            raise subprocess.TimeoutExpired(cmd="probe", timeout=120)
        return types.SimpleNamespace(returncode=0, stdout="tpu\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_PROBE_BUDGET_S", "3600")
    bench._wait_for_backend()
    assert len(calls) == 2  # one timeout, then success

    # budget exhausted: proceeds instead of spinning forever
    calls.clear()
    monkeypatch.setenv("BENCH_PROBE_BUDGET_S", "0")
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(
            subprocess.TimeoutExpired(cmd="probe", timeout=120)),
    )
    bench._wait_for_backend()  # returns despite persistent failure
