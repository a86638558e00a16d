"""Training stack: schedule goldens, device-side scoring, end-to-end learning
on synthetic data, checkpointers, stoppers (strategy: a real (tiny) training
run must reduce loss and beat chance accuracy — the end-to-end slice)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.data import load_dataset, Batcher
from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.train import (
    make_optimizer,
    every_n_iters_intervals,
    make_score_fn,
    make_train_step,
    TrainLoopState,
    train,
    LastModelsCheckpointer,
    BestModelCheckpointer,
    ValuesNotImprovingEarlyStopper,
    make_stopper_after_n_iters,
    make_stopper_on_nan_loss,
    save_pytree,
    load_pytree,
)
from dctn_tpu.train.step import make_gather_batch


def test_schedule_goldens():
    s = every_n_iters_intervals((10, 1), (100, 10), (None, 100))
    fired = [n for n in range(350) if s.should_fire(n)]
    assert fired[:12] == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 20]
    # at iter 110 the freq is already 100 and 110 % 100 != 0 → no fire
    # (same off-boundary behavior as the reference's modulo rule)
    assert 110 not in fired and 115 not in fired
    assert 100 in fired  # still inside the freq-10 window: 100 % 10 == 0
    assert 200 in fired and 210 not in fired  # freq 100 regime
    s2 = every_n_iters_intervals((None, 5))
    assert [n for n in range(12) if s2.should_fire(n)] == [0, 5, 10]


def make_tiny_problem(seed=0):
    splits = load_dataset(
        "mnist", "synthetic", synthetic_sizes=(256, 64, 64), phi_multiplier=1.0
    )
    cfg = EPSesPlusLinearConfig(epses_specs=((3, 4),), image_size=28, q0=2)
    key = jax.random.PRNGKey(seed)
    params = init_eps_plus_linear(key, cfg, "unit_theoretical_output_std")
    return splits, cfg, params


def test_score_matches_manual():
    splits, cfg, params = make_tiny_problem()
    score = make_score_fn(cfg, batch_size=48)  # ragged: 64 = 48 + 16
    x = jnp.asarray(splits.val.x)
    y = jnp.asarray(splits.val.y)
    mce, acc = score(params, x, y)
    # manual oracle
    from dctn_tpu.models import eps_plus_linear_forward

    logits = eps_plus_linear_forward(params, x, cfg)
    logp = jax.nn.log_softmax(logits)
    ce = -jnp.take_along_axis(logp, y[:, None], axis=1).mean()
    acc_manual = (jnp.argmax(logits, 1) == y).mean()
    np.testing.assert_allclose(float(mce), float(ce), rtol=1e-5)
    np.testing.assert_allclose(float(acc), float(acc_manual), rtol=1e-6)


def test_end_to_end_learning_and_hooks(tmp_path):
    splits, cfg, params = make_tiny_problem()
    opt = make_optimizer("adam", 3e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epses_composition", 1e-6, donate=False)
    x_tr = jnp.asarray(splits.train.x)
    y_tr = jnp.asarray(splits.train.y)
    gather = make_gather_batch(x_tr, y_tr)
    score = make_score_fn(cfg, batch_size=64)
    x_val, y_val = jnp.asarray(splits.val.x), jnp.asarray(splits.val.y)

    schedule = every_n_iters_intervals((None, 20))
    history = []

    @schedule
    def evaluate(state):
        trm, tra = score(state.params, x_tr, y_tr)
        vm, va = score(state.params, x_val, y_val)
        state.iter_metrics.update(
            train_mean_ce=float(trm),
            train_acc=float(tra),
            val_mean_ce=float(vm),
            val_acc=float(va),
        )
        history.append(state.iter_metrics.copy())

    ckpt_dir = str(tmp_path)
    last = LastModelsCheckpointer(ckpt_dir, 2)
    best = BestModelCheckpointer(ckpt_dir, "val_acc", low_is_good=False)
    stopper = make_stopper_after_n_iters(100)

    state = TrainLoopState(
        params=params, opt_state=opt_state, rng=jax.random.PRNGKey(7)
    )
    batcher = Batcher(splits.train, 64, shuffle=True, drop_last=True, seed=1)

    def index_stream():
        while True:
            for _ in range(len(batcher)):
                yield batcher.epoch_order()[:64]

    train(
        state,
        step,
        gather,
        index_stream(),
        at_iter_start=[
            evaluate,
            schedule(last),
            schedule(best),
            schedule(stopper),
        ],
        after_step=[schedule(make_stopper_on_nan_loss(ckpt_dir))],
    )
    assert state.stop_reason == "max_iters"
    assert state.num_iters_done == 100
    first, final = history[0], history[-1]
    assert final["train_mean_ce"] < first["train_mean_ce"]
    assert final["train_acc"] > 0.3  # well above 10% chance
    # checkpointer artifacts
    last.writer.wait()
    best.writer.wait()
    files = os.listdir(ckpt_dir)
    assert sum(f.startswith("model_nitd") for f in files) == 2  # ring of 2
    assert sum(f.startswith("model_best_val_acc") for f in files) == 1


def test_early_stopper():
    es = ValuesNotImprovingEarlyStopper(2, (("val_acc", False),))
    state = TrainLoopState(params=None, opt_state=None, rng=jax.random.PRNGKey(0))
    for i, acc in enumerate([0.5, 0.6, 0.55, 0.58, 0.59]):
        state.num_iters_done = i
        state.iter_metrics = {"val_acc": acc}
        es(state)
    assert state.stop and state.stop_reason == "early_stopping"


def test_nan_stopper(tmp_path):
    splits, cfg, params = make_tiny_problem()
    opt = make_optimizer("sgd", 1e9)  # absurd lr → overflow fast
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epswise", 0.0, donate=False)
    x_tr, y_tr = jnp.asarray(splits.train.x), jnp.asarray(splits.train.y)
    gather = make_gather_batch(x_tr, y_tr)
    state = TrainLoopState(params=params, opt_state=opt_state, rng=jax.random.PRNGKey(0))
    from dctn_tpu.models import eps_plus_linear_forward

    forward = lambda p, xb: eps_plus_linear_forward(p, xb, cfg, training=False)
    nan_hook = make_stopper_on_nan_loss(str(tmp_path), forward)
    cap = make_stopper_after_n_iters(50)

    def stream():
        while True:
            yield np.arange(64)

    train(state, step, gather, stream(), at_iter_start=[cap], after_step=[nan_hook])
    assert state.stop_reason == "nan_loss"
    dump = os.path.join(str(tmp_path), "nan_loss_stop")
    assert os.path.exists(dump)
    # full dump parity with training.py:213-237: model + batch (x, y) + output
    files = os.listdir(dump)
    assert any(f.startswith("model_nitd=") for f in files)
    assert "batch_indices.npy" in files and "batch.npz" in files
    batch = np.load(os.path.join(dump, "batch.npz"))
    assert batch["x"].shape[1] == 64 and batch["y"].shape == (64,)
    out = np.load(os.path.join(dump, "output.npy"))
    assert out.shape == (64, 10)


def test_checkpoint_roundtrip(tmp_path, rng):
    splits, cfg, params = make_tiny_problem()
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    fname = os.path.join(str(tmp_path), "ckpt.npz")
    save_pytree({"params": params, "opt_state": opt_state, "step": 5}, fname)
    template = {"params": params, "opt_state": opt.init(params), "step": 0}
    restored = load_pytree(template, fname)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored["params"]),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["step"]) == 5


def test_grad_accumulation_matches_full_batch(rng):
    """grad_accum_steps=4 gives the same update as the full-batch step (up to
    reduction order) when dropout is off."""
    splits, cfg, params = make_tiny_problem()
    opt = make_optimizer("sgd", 1e-2)  # sgd: update = -lr·grad exactly
    x_tr = jnp.asarray(splits.train.x[:, :64])
    y_tr = jnp.asarray(splits.train.y[:64])
    step1 = make_train_step(cfg, opt, "epswise", 1e-6, donate=False)
    step4 = make_train_step(
        cfg, opt, "epswise", 1e-6, donate=False, grad_accum_steps=4
    )
    k = jax.random.PRNGKey(0)
    p1, _, m1 = step1(params, opt.init(params), k, x_tr, y_tr)
    p4, _, m4 = step4(params, opt.init(params), k, x_tr, y_tr)
    np.testing.assert_allclose(float(m1["ce"]), float(m4["ce"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)


def test_frozen_eps(rng):
    splits, cfg, params = make_tiny_problem()
    opt = make_optimizer("adam", 1e-2)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epswise", 0.0, frozen_eps_indices=(0,), donate=False)
    x_tr, y_tr = jnp.asarray(splits.train.x), jnp.asarray(splits.train.y)
    before = np.asarray(params["epses"][0])
    p2, _, _ = step(params, opt_state, jax.random.PRNGKey(1), x_tr[:, :64], y_tr[:64])
    np.testing.assert_array_equal(np.asarray(p2["epses"][0]), before)
    assert not np.allclose(np.asarray(p2["linear"]["w"]), np.asarray(params["linear"]["w"]))


def test_nan_replay_isolates_triggering_batch(tmp_path):
    """VERDICT r3 #7 (reference parity+, training.py:213-237): poison ONE
    sample so the loss first goes non-finite at a KNOWN iteration between
    two scheduled observations. The stopper's replay (anchored device
    copies + recorded index history) must dump THAT iteration's batch and
    the params as they were BEFORE its update — not the observation step's."""
    from dctn_tpu.train import every_n_iters_intervals

    splits, cfg, params = make_tiny_problem()
    opt = make_optimizer("sgd", 1e-2)
    opt_state = opt.init(params)
    # sgd at sane lr: only the poisoned batch can blow up the loss
    step = make_train_step(cfg, opt, "epswise", 0.0, donate=True)
    x = np.asarray(splits.train.x).copy()
    x[:, 13] = 1e30  # sample 13 → overflow the moment it enters a batch
    gather = make_gather_batch(jnp.asarray(x), jnp.asarray(splits.train.y))
    state = TrainLoopState(
        params=params, opt_state=opt_state, rng=jax.random.PRNGKey(0)
    )
    from dctn_tpu.models import eps_plus_linear_forward

    forward = lambda p, xb: eps_plus_linear_forward(  # noqa: E731
        p, xb, cfg, training=False
    )
    nan_hook = make_stopper_on_nan_loss(
        str(tmp_path), forward, replay_step=step, replay_gather=gather
    )
    nan_hook.enable_replay(state)
    schedule = every_n_iters_intervals((None, 5))
    cap = make_stopper_after_n_iters(50)

    def stream():  # step i takes samples [8i, 8i+8): sample 13 is in step 1
        i = 0
        while True:
            yield np.arange(8 * i, 8 * i + 8) % 64
            i += 1

    train(
        state, step, gather, stream(),
        at_iter_start=[cap], after_step=[schedule(nan_hook)],
    )
    assert state.stop_reason == "nan_loss"
    assert state.num_iters_done == 5  # flag observed at the schedule, not at 1
    dump = os.path.join(str(tmp_path), "nan_loss_stop")
    files = os.listdir(dump)
    # the dump names the TRIGGERING iteration (1), not the observation (5)
    assert "model_nitd=1.npz" in files, files
    readme = open(os.path.join(dump, "README.txt")).read()
    assert "TRIGGERING iteration: 1" in readme
    np.testing.assert_array_equal(
        np.load(os.path.join(dump, "batch_indices.npy")), np.arange(8, 16)
    )
    batch = np.load(os.path.join(dump, "batch.npz"))
    assert batch["x"].max() >= 1e29  # the poisoned sample is IN the batch
    # the saved params are the PRE-step-1 params: reproduce them by running
    # exactly iteration 0 from the same init + rng chain
    _, sub0 = jax.random.split(jax.random.PRNGKey(0))
    step_nd = make_train_step(cfg, opt, "epswise", 0.0, donate=False)
    xb0, yb0 = gather(jnp.asarray(np.arange(0, 8)))
    # (the original `params` were donated by the training run — re-init)
    _, _, params0 = make_tiny_problem()
    p1, _, _ = step_nd(params0, opt.init(params0), sub0, xb0, yb0)
    want = {
        k: np.asarray(v)
        for k, v in np.load(
            os.path.join(dump, "model_nitd=1.npz")
        ).items()
    }
    got_leaves = jax.tree_util.tree_leaves(p1)
    assert len(want) == len(got_leaves)
    for (name, w), g in zip(sorted(want.items()), got_leaves):
        np.testing.assert_array_equal(w, np.asarray(g), err_msg=name)


def test_grad_accum_with_probs_matches_single_scan(rng):
    """VERDICT r3 #8: --tb-batches composes with gradient accumulation —
    the per-microbatch probabilities concatenate back to batch order and
    (dropout off) equal the unaccumulated step's exactly."""
    splits, cfg, params = make_tiny_problem()
    opt = make_optimizer("sgd", 1e-2)
    x_tr = jnp.asarray(splits.train.x[:, :32])
    y_tr = jnp.asarray(splits.train.y[:32])
    step1 = make_train_step(
        cfg, opt, "epswise", 1e-6, donate=False, with_probs=True
    )
    step4 = make_train_step(
        cfg, opt, "epswise", 1e-6, donate=False, with_probs=True,
        grad_accum_steps=4,
    )
    k = jax.random.PRNGKey(0)
    _, _, m1 = step1(params, opt.init(params), k, x_tr, y_tr)
    _, _, m4 = step4(params, opt.init(params), k, x_tr, y_tr)
    p1 = np.asarray(m1["probs_of_true_class"])
    p4 = np.asarray(m4["probs_of_true_class"])
    assert p1.shape == p4.shape == (32,)
    np.testing.assert_allclose(p4, p1, rtol=1e-6)


def test_nan_stopper_interactive_breakpoint(tmp_path, monkeypatch):
    """--breakpoint-on-nan-loss analog (new_runner.py:170): interactive=True
    invokes breakpoint() (sys.breakpointhook) after the forensics, with the
    triggering-iteration host values computed."""
    import sys as _sys

    calls = []
    monkeypatch.setattr(_sys, "breakpointhook", lambda *a, **k: calls.append(1))
    splits, cfg, params = make_tiny_problem()
    opt = make_optimizer("sgd", 1e9)  # overflow fast
    step = make_train_step(cfg, opt, "epswise", 0.0, donate=False)
    gather = make_gather_batch(
        jnp.asarray(splits.train.x), jnp.asarray(splits.train.y)
    )
    state = TrainLoopState(
        params=params, opt_state=opt.init(params), rng=jax.random.PRNGKey(0)
    )
    nan_hook = make_stopper_on_nan_loss(str(tmp_path), interactive=True)

    def stream():
        while True:
            yield np.arange(64)

    train(
        state, step, gather, stream(),
        at_iter_start=[make_stopper_after_n_iters(50)],
        after_step=[nan_hook],
    )
    assert state.stop_reason == "nan_loss"
    assert calls, "breakpoint() was not invoked"
