"""StepTracer + --profile-dir: jax.profiler device traces of a training
window (SURVEY §5: the TPU-native replacement for the reference's
timeit/CUDA-sync micro-benchmarks is jax.profiler tracing + the throughput
harness)."""

import os
import types

from dctn_tpu.train.loop import TrainLoopState
from dctn_tpu.utils.profiling import StepTracer


def _state(it: int) -> TrainLoopState:
    return TrainLoopState(params=None, opt_state=None, rng=None,
                          num_iters_done=it)


def test_step_tracer_window(monkeypatch):
    """Starts at iter >= start, stops at start+count, exactly once each."""
    import jax

    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append(("start", d)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append(("stop",)))
    tr = StepTracer("/tmp/trace_test", start=2, count=3)
    for it in range(8):
        tr(_state(it))
    tr.close()  # idempotent: already stopped at iter 5
    assert calls == [("start", "/tmp/trace_test"), ("stop",)]


def test_step_tracer_close_on_early_stop(monkeypatch):
    """Training may stop inside the window: close() must stop the trace."""
    import jax

    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append("start"))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append("stop"))
    tr = StepTracer("/tmp/trace_test", start=0, count=100)
    tr(_state(0))
    tr.close()
    tr.close()
    assert calls == ["start", "stop"]


def test_step_tracer_degrades_without_backend(monkeypatch):
    """A backend that cannot trace disables the tracer instead of raising."""
    import jax

    def boom(d):
        raise RuntimeError("no trace support")

    monkeypatch.setattr(jax.profiler, "start_trace", boom)
    tr = StepTracer("/tmp/trace_test", start=0, count=2)
    tr(_state(0))
    assert tr.done and not tr.active
    tr(_state(1))  # no retry storm
    tr.close()


def test_runner_profile_dir(tmp_path):
    """--profile-dir end to end on the CPU backend: the window traces and a
    profile lands on disk."""
    from dctn_tpu.cli.runner import run

    prof = str(tmp_path / "prof")
    run(
        experiments_dir=str(tmp_path / "runs"),
        ds_type="mnist",
        ds_path="synthetic",
        epses_specs=((2, 4),),
        batch_size=32,
        optimizer_name="adam",
        lr=3e-3,
        init_epses_composition_unit_theoretical_output_std=True,
        eval_schedule=((None, 10),),
        keep_last_models=1,
        synthetic_sizes=(128, 64, 64),
        patience=50,
        max_num_iters=10,
        profile_dir=prof,
        profile_iters=(2, 3),
    )
    (sub,) = os.listdir(str(tmp_path / "runs"))
    log = open(os.path.join(str(tmp_path / "runs"), sub, "log.log")).read()
    assert "profiler trace" in log
    if "profiler trace written" in log:
        found = []
        for root, _dirs, files in os.walk(prof):
            found.extend(files)
        assert found, "trace reported written but no files on disk"
