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
