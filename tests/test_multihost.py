"""REAL multi-host (multi-controller) data-parallel training over loopback.

docs/multihost.md describes the DCN bring-up a TPU pod uses
(``jax.distributed.initialize`` → one global mesh → the same shard_map DP
step); this test runs that path for real: TWO separate Python processes
(tests/multihost_worker.py), each owning 2 local CPU devices, join one
4-device ``data`` mesh and train the production DP step with cross-process
gloo collectives. Asserts: (a) both ranks hold bitwise-identical replicated
parameters after training (the all-reduce is deterministic and consistent),
(b) the loss trajectory and eval metrics match a single-process 4-device
run of the same job to f32-rounding tolerance (training computes in f32 and
the cross-process reduction order differs, so not bitwise by contract).

The reference is strictly single-process (SURVEY §2.3): its only
multi-device mechanism is independent sweep processes
(lr_gridsearch.py:68-87).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual CPU mesh"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same 5-step job on a 4-device single-process mesh."""
    from dctn_tpu.data import load_dataset
    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.parallel import (
        make_mesh,
        make_parallel_score_fn,
        make_parallel_train_step,
        replicate,
        shard_split,
    )
    from dctn_tpu.train import make_optimizer

    splits = load_dataset(
        "mnist", "synthetic", synthetic_sizes=(64, 16, 16), phi_multiplier=1.0
    )
    cfg = EPSesPlusLinearConfig(epses_specs=((3, 4),), image_size=28, q0=2)
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4)
    split = shard_split(mesh, splits.train.x, np.asarray(splits.train.y))
    params = replicate(mesh, params)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    step = make_parallel_train_step(
        cfg, opt, mesh, reg_type="epses_composition", reg_coeff=1e-6,
        donate=False,
    )
    rng = jax.random.PRNGKey(7)
    losses = []
    for i in range(5):
        idx = (np.arange(4 * 4, dtype=np.int32) + 3 * i) % split.n_local
        params, opt_state, metrics = step(
            params, opt_state, rng, split.x, split.y, idx.reshape(4, 4)
        )
        losses.append(float(metrics["loss"]))
    score = make_parallel_score_fn(cfg, mesh, batch_size=8)
    val = shard_split(mesh, splits.val.x, np.asarray(splits.val.y))
    mce, acc = score(params, val)
    sums = [
        float(np.asarray(l, dtype=np.float64).sum())
        for l in jax.tree_util.tree_leaves(params)
    ]

    # the flagship fast (cmt) Pallas phase, single-process (mirrors the
    # worker's phase 2 exactly)
    import dataclasses

    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
    from dctn_tpu.parallel import make_parallel_fast_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg_f = dataclasses.replace(
        cfg, train_backend="pallas_interpret",
        eval_backend="pallas_interpret", dropout_p=0.8,
    )
    params_f = init_eps_plus_linear(jax.random.PRNGKey(0), cfg_f)
    fast, plans = fast_params_from_reference(params_f, cfg_f)
    fast = replicate(mesh, fast)
    opt_state_f = opt.init(fast)
    step_f = make_parallel_fast_train_step(
        cfg_f, opt, plans, mesh, "epswise", 1e-4, donate=False
    )
    fast_losses = []
    for i in range(2):
        idx = (np.arange(4 * 4, dtype=np.int32) + 5 * i) % split.n_local
        fast, opt_state_f, m = step_f(
            fast, opt_state_f, rng, split.x, split.y, idx.reshape(4, 4)
        )
        fast_losses.append(float(m["loss"]))
    return losses, float(mce), float(acc), sums, fast_losses


def test_two_process_dp_training_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers pick their own platform in-process; scrub any test-runner
    # pinning so the subprocess config-update dance is what decides
    env.pop("XLA_FLAGS", None)

    procs, outs = [], []
    for rank in range(2):
        out = tmp_path / f"rank{rank}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(rank), "2", str(port), str(out)],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    tails = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        tails.append(err[-4000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    results = [json.loads(out.read_text()) for out in outs]
    for r in results:
        assert r["process_count"] == 2
        assert r["device_count"] == 4

    # (a) cross-rank consistency: the replicated state is IDENTICAL on both
    # controllers — bitwise (same collective result delivered everywhere)
    assert results[0]["param_digest"] == results[1]["param_digest"]
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["val_acc"] == results[1]["val_acc"]
    assert results[0]["fast_digest"] == results[1]["fast_digest"]
    assert results[0]["fast_losses"] == results[1]["fast_losses"]

    # (b) parity with the single-process 4-device mesh. Training computes in
    # f32, and the gloo cross-process all-reduce sums in a different order
    # than XLA's local one — so the contract is f32-rounding-level closeness
    # (measured: 2.4e-7 max over 5 steps), not bitwise.
    losses, mce, acc, sums, fast_losses = _single_process_reference()
    np.testing.assert_allclose(results[0]["losses"], losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0]["val_mce"], mce, rtol=1e-5, atol=1e-6)
    # acc is a count ratio over 16 val samples: identical unless a borderline
    # sample flips inside the f32 noise — allow at most that one sample
    assert abs(results[0]["val_acc"] - acc) <= 1.0 / 16 + 1e-12
    np.testing.assert_allclose(results[0]["param_sums"], sums, rtol=1e-4, atol=1e-6)
    # the flagship fast (cmt) Pallas path, cross-process vs single-process
    np.testing.assert_allclose(
        results[0]["fast_losses"], fast_losses, rtol=1e-5, atol=1e-6
    )


RUNNER_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from dctn_tpu.cli.runner import run
state = run(
    experiments_dir={outdir!r},
    distributed="127.0.0.1:{port},2,{rank}",
    ds_type="mnist", ds_path="synthetic",
    epses_specs=((2, 4),),
    batch_size=16,
    mesh_devices=4,
    optimizer_name="adam", lr=3e-3,
    init_epses_composition_unit_theoretical_output_std=True,
    eval_schedule=((None, 10),),
    max_num_iters=20,
    keep_last_models=1,
    synthetic_sizes=(64, 32, 32),
    patience=50,
    reg_coeff=1e-6,
)
assert state.stop_reason == "max_iters", state.stop_reason
"""


def test_distributed_runner_cli_two_processes(tmp_path):
    """--distributed through the FULL runner CLI: two controllers (2 local
    CPU devices each) train one --mesh-devices 4 job. Process 0 writes
    checkpoints + train states; process 1 writes none (docs/multihost.md);
    both log IDENTICAL eval lines (the replicated metrics agree)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for rank in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c",
                    RUNNER_CHILD.format(
                        outdir=str(tmp_path / f"r{rank}"), port=port,
                        rank=rank,
                    ),
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    tails = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        tails.append(err[-4000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    def run_dir(rank):
        root = tmp_path / f"r{rank}"
        (sub,) = os.listdir(root)
        return os.path.join(root, sub)

    d0, d1 = run_dir(0), run_dir(1)
    assert os.path.basename(d1).endswith("-proc1")  # no shared-FS collision
    # only process 0 writes checkpoints / train states
    assert os.path.exists(os.path.join(d0, "train_state_latest.npz"))
    assert any(f.startswith("model_nitd") for f in os.listdir(d0))
    assert not os.path.exists(os.path.join(d1, "train_state_latest.npz"))
    assert not any(f.startswith("model_nitd") for f in os.listdir(d1))

    # both controllers computed the SAME replicated metrics: the eval lines
    # (fixed reference format, parsed by viz.log_parsing) match textually
    def eval_lines(d):
        with open(os.path.join(d, "log.log")) as f:
            return [
                l.split("iters:", 1)[1]
                for l in f
                if "After" in l and "iters:" in l
            ]
    l0, l1 = eval_lines(d0), eval_lines(d1)
    assert l0 and l0 == l1

    # the saved state resumes on a SINGLE process/device (elastic, as for DP)
    from dctn_tpu.cli.runner import run as run_inproc

    state = run_inproc(
        experiments_dir=str(tmp_path / "resumed"),
        ds_type="mnist", ds_path="synthetic",
        epses_specs=((2, 4),),
        batch_size=16,
        optimizer_name="adam", lr=3e-3,
        init_epses_composition_unit_theoretical_output_std=True,
        eval_schedule=((None, 10),),
        max_num_iters=30,
        keep_last_models=1,
        synthetic_sizes=(64, 32, 32),
        patience=50,
        reg_coeff=1e-6,
        resume_from=os.path.join(d0, "train_state_latest.npz"),
    )
    assert state.num_iters_done == 30


AUTOTUNE_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from dctn_tpu.cli.runner import run
state = run(
    experiments_dir={outdir!r},
    distributed="127.0.0.1:{port},2,{rank}",
    ds_type="mnist", ds_path="synthetic",
    epses_specs=((2, 4), (2, 4)),
    batch_size=16,
    mesh_devices=4,
    optimizer_name="adam", lr=3e-3,
    train_backend="pallas_interpret", eval_backend="pallas_interpret",
    autotune_splits=True,
    autotune_cache=False,
    init_epses_composition_unit_theoretical_output_std=True,
    eval_schedule=((None, 10),),
    max_num_iters=20,
    keep_last_models=1,
    synthetic_sizes=(64, 32, 32),
    patience=50,
    reg_coeff=1e-6,
)
assert state.stop_reason == "max_iters", state.stop_reason
"""


def test_distributed_autotune_broadcasts_picks(tmp_path):
    """--autotune-splits under --distributed: ONLY process 0 measures; the
    picks are broadcast so every controller matricizes the SAME cmt shapes
    (per-process measurement could pick different splits from timing noise —
    the replicated layout must agree globally). Both controllers train to
    completion and log identical eval lines."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for rank in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c",
                    AUTOTUNE_CHILD.format(
                        outdir=str(tmp_path / f"r{rank}"), port=port,
                        rank=rank,
                    ),
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    tails = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        tails.append(err[-4000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    def run_dir(rank):
        root = tmp_path / f"r{rank}"
        (sub,) = os.listdir(root)
        return os.path.join(root, sub)

    d0, d1 = run_dir(0), run_dir(1)
    log0 = open(os.path.join(d0, "log.log")).read()
    log1 = open(os.path.join(d1, "log.log")).read()
    # process 0 measured; process 1 received without measuring
    assert "picked n1=" in log0
    assert "broadcast from process 0" in log1
    assert "picked n1=" not in log1
    # both controllers hold the same replicated state: identical eval lines
    def eval_lines(s):
        return [
            l.split("iters:", 1)[1]
            for l in s.splitlines()
            if "After" in l and "iters:" in l
        ]
    l0, l1 = eval_lines(log0), eval_lines(log1)
    assert l0 and l0 == l1
    # both reports record the same picks
    rep0 = json.loads(
        open(os.path.join(d0, "autotune_report.json")).read()
    )
    rep1 = json.loads(
        open(os.path.join(d1, "autotune_report.json")).read()
    )
    assert [r["picked_n1"] for r in rep0] == [r["picked_n1"] for r in rep1]
    assert all(r.get("broadcast_from_process_0") for r in rep1)


PREEMPT_CHILD = """
import jax, json
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from dctn_tpu.cli.runner import run
state = run(
    experiments_dir={outdir!r},
    distributed="127.0.0.1:{port},2,{rank}",
    ds_type="mnist", ds_path="synthetic",
    epses_specs=((2, 4),),
    batch_size=16,
    mesh_devices=4,
    optimizer_name="adam", lr=3e-3,
    init_epses_composition_unit_theoretical_output_std=True,
    eval_schedule=((None, 40),),
    max_num_iters=10**6,
    keep_last_models=1,
    synthetic_sizes=(64, 32, 32),
    patience=10**6,
    reg_coeff=1e-6,
    preempt_sync_steps=8,
)
json.dump(
    {{"reason": state.stop_reason, "iters": state.num_iters_done}},
    open({result!r}, "w"),
)
"""


def test_distributed_preemption_stops_all_controllers_together(tmp_path):
    """SIGTERM delivered to ONE controller of a 2-process job: an immediate
    local stop would strand the peer in the next step's collectives forever.
    The synced stop (--preempt-sync-steps) must bring BOTH processes down
    cleanly, at the SAME step, with process 0 saving the train state."""
    import signal
    import time as _time

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs, results = [], []
    for rank in range(2):
        res = tmp_path / f"result{rank}.json"
        results.append(res)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c",
                    PREEMPT_CHILD.format(
                        outdir=str(tmp_path / f"r{rank}"), port=port,
                        rank=rank, result=str(res),
                    ),
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )

    # wait until training is demonstrably under way (the scheduled saver
    # writes the train state at eval points), then signal ONLY process 0
    def rank0_state_file():
        root = tmp_path / "r0"
        if not root.exists() or not os.listdir(root):
            return None
        (sub,) = os.listdir(root)
        p = os.path.join(root, sub, "train_state_latest.npz")
        return p if os.path.exists(p) else None

    deadline = _time.monotonic() + 600
    while rank0_state_file() is None:
        assert _time.monotonic() < deadline, "training never started"
        for p in procs:
            assert p.poll() is None, p.communicate()[1][-4000:]
        _time.sleep(1.0)
    procs[0].send_signal(signal.SIGTERM)

    tails = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(
                "a controller hung after a single-process SIGTERM — the "
                "synced preemption stop did not propagate"
            )
        tails.append(err[-4000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    r0, r1 = (json.loads(r.read_text()) for r in results)
    assert r0["reason"].startswith("preempted"), r0
    assert r1["reason"].startswith("preempted"), r1
    assert r0["iters"] == r1["iters"]  # the agreed stop step
    assert rank0_state_file() is not None
    # process 1 never writes a train state
    (sub1,) = os.listdir(tmp_path / "r1")
    assert not os.path.exists(
        os.path.join(tmp_path / "r1", sub1, "train_state_latest.npz")
    )


LEGACY_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from dctn_tpu.cli.legacy_runner import run
params, best_acc = run(
    ds_path="synthetic",
    models_dir={outdir!r},
    distributed="127.0.0.1:{port},2,{rank}",
    mesh_devices=4,
    num_sbs_layers=2,
    bond_dim_size=2,
    initialization="khrulkov-normal",
    learning_rate=3e-3,
    optimizer_type="rmsprop",
    batch_size=16,
    epochs=2,
    warmup_num_epochs=1,
    warmup_initial_multiplier=1e-2,
    make_input_window_std_one=True,
    scale_layers_using_batch=32,
    synthetic_sizes=(64, 32),
    seed=0,
    tb_log_every_n_epochs=0,
)
assert 0.0 <= best_acc <= 1.0
"""


def test_distributed_legacy_runner_two_processes(tmp_path):
    """--distributed through the LEGACY ConvSBS runner: both model families
    train multi-controller. Process 0 writes the best-model checkpoint and
    the per-epoch train state; process 1 gets a '-proc1' dir with neither;
    both controllers log identical per-epoch eval lines."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    outdir = str(tmp_path / "m")
    procs = []
    for rank in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c",
                    LEGACY_CHILD.format(outdir=outdir, port=port, rank=rank),
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    tails = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        tails.append(err[-4000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    d0, d1 = outdir, outdir + "-proc1"
    assert os.path.isdir(d1)
    assert os.path.exists(os.path.join(d0, "train_state_latest.npz"))
    assert any(f.startswith("dctn_epoch=") for f in os.listdir(d0))
    assert not os.path.exists(os.path.join(d1, "train_state_latest.npz"))
    assert not any(f.startswith("dctn_epoch=") for f in os.listdir(d1))

    def eval_lines(d):
        with open(os.path.join(d, "log.log")) as f:
            return [
                l.split("epoch", 1)[1] for l in f if "val ce=" in l
            ]
    l0, l1 = eval_lines(d0), eval_lines(d1)
    assert l0 and l0 == l1


# ---------------------------------------------------------------------------
# TP / SP / SP×TP across processes (VERDICT r3 #1: the one untested reachable
# combination — model-sharded meshes under --distributed)

TP_SP_WORKER = os.path.join(REPO, "tests", "multihost_tp_sp_worker.py")


def _tp_sp_single_process_reference():
    """The identical three-phase job on single-process 8-device meshes."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    try:
        from multihost_tp_sp_worker import run_phases
    finally:
        sys.path.pop(0)
    from dctn_tpu.parallel import make_sp_mesh, make_tp_mesh
    from dctn_tpu.parallel.sp_tp import make_sp_tp_mesh

    def mesh_for(kind):
        return {
            "tp": lambda: make_tp_mesh(4, 2),
            "sp": lambda: make_sp_mesh(4, 2),
            "sp_tp": lambda: make_sp_tp_mesh(2, 2, 2),
        }[kind]()

    return run_phases(mesh_for)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)
def test_two_process_tp_sp_training_matches_single_process(tmp_path):
    """TWO controllers (4 local CPU devices each) run the production
    fast-layout TP, SP and SP×TP train steps on one global 8-device mesh —
    the model axes span PROCESSES (cross-process psum for sharded-core
    grads, cross-process halo ppermute for SP). Asserts: both ranks hold
    identical merged parameters (bitwise), and every phase matches the
    single-process 8-device run of the same job to f32-rounding tolerance."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)

    procs, outs = [], []
    for rank in range(2):
        out = tmp_path / f"rank{rank}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, TP_SP_WORKER, str(rank), "2", str(port),
                 str(out)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    tails = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        tails.append(err[-4000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    results = [json.loads(out.read_text()) for out in outs]
    ref = _tp_sp_single_process_reference()
    for phase in ("tp", "sp", "sp_tp"):
        a, b = results[0][phase], results[1][phase]
        # cross-rank: identical collectives delivered everywhere — bitwise
        assert a["digest"] == b["digest"], phase
        assert a["losses"] == b["losses"], phase
        # vs single-process: f32 + different cross-process reduction order
        r = ref[phase]
        np.testing.assert_allclose(
            a["losses"], r["losses"], rtol=1e-5, atol=1e-6, err_msg=phase
        )
        np.testing.assert_allclose(
            a["mce"], r["mce"], rtol=1e-5, atol=1e-6, err_msg=phase
        )
        assert abs(a["acc"] - r["acc"]) <= 1.0 / 16 + 1e-12, phase
        np.testing.assert_allclose(
            a["param_sums"], r["param_sums"], rtol=1e-4, atol=1e-6,
            err_msg=phase,
        )


TP_RUNNER_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from dctn_tpu.cli.runner import run
state = run(
    experiments_dir={outdir!r},
    distributed="127.0.0.1:{port},2,{rank}",
    ds_type="mnist", ds_path="synthetic",
    epses_specs=((2, 4),),
    batch_size=8,
    mesh_devices=2,
    {axis_flag}=2,
    optimizer_name="adam", lr=3e-3,
    train_backend="pallas_interpret", eval_backend="pallas_interpret",
    init_epses_composition_unit_theoretical_output_std=True,
    eval_schedule=((None, 5),),
    max_num_iters=10,
    keep_last_models=1,
    synthetic_sizes=(32, 16, 16),
    patience=50,
    tb_batches=True,
    reg_coeff=1e-6,
)
assert state.stop_reason == "max_iters", state.stop_reason
"""


def _run_distributed_runner_pair(tmp_path, axis_flag):
    """Launch the FULL runner CLI twice with --distributed and a
    model-sharded axis; return (d0, d1) run dirs after asserting success."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for rank in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c",
                    TP_RUNNER_CHILD.format(
                        outdir=str(tmp_path / f"r{rank}"), port=port,
                        rank=rank, axis_flag=axis_flag,
                    ),
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    tails = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        tails.append(err[-4000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail

    def run_dir(rank):
        root = tmp_path / f"r{rank}"
        (sub,) = os.listdir(root)
        return os.path.join(root, sub)

    d0, d1 = run_dir(0), run_dir(1)
    # only process 0 writes checkpoints / train states — but BOTH ran the
    # collective host gathers inside the hooks (else the job would hang)
    assert os.path.exists(os.path.join(d0, "train_state_latest.npz"))
    assert any(f.startswith("model_nitd") for f in os.listdir(d0))
    assert not os.path.exists(os.path.join(d1, "train_state_latest.npz"))
    assert not any(f.startswith("model_nitd") for f in os.listdir(d1))

    def eval_lines(d):
        with open(os.path.join(d, "log.log")) as f:
            return [
                l.split("iters:", 1)[1]
                for l in f
                if "After" in l and "iters:" in l
            ]

    l0, l1 = eval_lines(d0), eval_lines(d1)
    assert l0 and l0 == l1
    # --tb-batches under --distributed (VERDICT r3 #8): the data-sharded
    # per-sample probs are gathered collectively; every controller logs them
    for d in (d0, d1):
        tags = {
            json.loads(l)["tag"]
            for l in open(os.path.join(d, "metrics.jsonl"))
        }
        assert "probs_of_true_class" in tags, (d, tags)
    return d0, d1


def test_distributed_runner_tp_two_processes(tmp_path):
    """--distributed × --model-devices through the FULL runner CLI (the
    VERDICT-r3 hole): two controllers form one (data=2, model=2) mesh whose
    MODEL axis spans processes. Process 0's checkpoints are the gathered
    reference layout — loadable by a plain single-process run."""
    d0, _ = _run_distributed_runner_pair(tmp_path, "model_devices")

    # the merged (reference-layout) checkpoint round-trips into a fresh
    # SINGLE-process run
    ckpt = next(
        os.path.join(d0, f)
        for f in os.listdir(d0)
        if f.startswith("model_nitd")
    )
    from dctn_tpu.cli.runner import run as run_inproc

    state = run_inproc(
        experiments_dir=str(tmp_path / "reload"),
        ds_type="mnist", ds_path="synthetic",
        epses_specs=((2, 4),),
        batch_size=8,
        optimizer_name="adam", lr=3e-3,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        init_epses_composition_unit_theoretical_output_std=True,
        load_model_state=ckpt,
        eval_schedule=((None, 5),),
        max_num_iters=5,
        keep_last_models=1,
        synthetic_sizes=(32, 16, 16),
        patience=50,
        reg_coeff=1e-6,
    )
    assert state.num_iters_done == 5


def test_distributed_runner_sp_two_processes(tmp_path):
    """--distributed × --space-devices through the FULL runner CLI: the
    halo ppermute crosses processes every layer; checkpoints come out of
    process 0 in the reference layout."""
    _run_distributed_runner_pair(tmp_path, "space_devices")


SPTP_RUNNER_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
from dctn_tpu.cli.runner import run
state = run(
    experiments_dir={outdir!r},
    distributed="127.0.0.1:{port},2,{rank}",
    ds_type="mnist", ds_path="synthetic",
    epses_specs=((2, 4),),
    batch_size=8,
    mesh_devices=2,
    space_devices=2,
    model_devices=2,
    optimizer_name="adam", lr=3e-3,
    train_backend="pallas_interpret", eval_backend="pallas_interpret",
    init_epses_composition_unit_theoretical_output_std=True,
    eval_schedule=((None, 5),),
    max_num_iters=10,
    keep_last_models=1,
    synthetic_sizes=(32, 16, 16),
    patience=50,
    reg_coeff=1e-6,
    resume_from={resume!r},
)
assert state.stop_reason == "max_iters", state.stop_reason
"""


def _launch_pair(child_src, tmp_path, port, tag, resume=(None, None)):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for rank in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c",
                    child_src.format(
                        outdir=str(tmp_path / f"{tag}{rank}"), port=port,
                        rank=rank, resume=resume[rank],
                    ),
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    tails = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        tails.append(err[-4000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail
    dirs = []
    for rank in range(2):
        root = tmp_path / f"{tag}{rank}"
        (sub,) = os.listdir(root)
        dirs.append(os.path.join(root, sub))
    return dirs


def test_distributed_runner_sp_tp_and_resume(tmp_path):
    """The COMPOSED (data, space, model) mesh through the full runner CLI
    across 2 controllers (4 local devices each), plus the multi-process
    RESUME path: the restored host train state must be re-placed onto the
    global mesh (params by template sharding, rng replicated) — the r4
    `_replace_like` wiring."""
    d0, d1 = _launch_pair(
        SPTP_RUNNER_CHILD, tmp_path, _free_port(), "a"
    )
    state_file = os.path.join(d0, "train_state_latest.npz")
    assert os.path.exists(state_file)
    assert not os.path.exists(os.path.join(d1, "train_state_latest.npz"))

    # resume the SAME 2-process topology from process 0's saved state
    # (both controllers restore the same file)
    r0, r1 = _launch_pair(
        SPTP_RUNNER_CHILD.replace("max_num_iters=10", "max_num_iters=20"),
        tmp_path, _free_port(), "b",
        resume=(state_file, state_file),
    )

    def eval_iters(d):
        with open(os.path.join(d, "log.log")) as f:
            return [
                int(l.split("After", 1)[1].split("iters", 1)[0])
                for l in f
                if "After" in l and "iters:" in l
            ]

    # the resumed run continues FROM the saved step (10): no eval before it
    its = eval_iters(r0)
    assert its and min(its) >= 10, its
    assert eval_iters(r0) == eval_iters(r1)
