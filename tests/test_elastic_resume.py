"""Elastic resume: continue a preempted data-parallel run on a DIFFERENT
mesh size.

On TPU fleets the slice you get back after a preemption is often not the
slice you lost — maintenance may return 4 chips where you had 8, or a
bigger reservation may open up. Because dctn-tpu's DP design replicates
params and optimizer state (only the DATA is sharded), the full-resume
train state is mesh-shape-free: ``--resume-from`` restores it onto
whatever ``--mesh-devices`` the relaunch requests — larger, smaller, or
single-device. No reference analog (``dctn/training.py`` has no recovery
at all, and no notion of a device mesh).

Exactness contract (docs/multihost.md): SAME-mesh resume is bit-identical
to an uninterrupted run (the per-shard index streams are fast-forwarded);
a CHANGED-mesh resume restores params/optimizer/rng exactly but the
subsequent batch composition differs by design — the per-shard sampling
that makes DP scale (no cross-device gathers) is mesh-shaped, so the
continuation is statistically equivalent, not bitwise.
"""

import os

import jax
import numpy as np
import pytest

from dctn_tpu.cli.runner import run

COMMON = dict(
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
)


def _needs_devices(n: int) -> None:
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


def _state_file(root: str) -> str:
    (sub,) = os.listdir(root)
    return os.path.join(root, sub, "train_state_latest.npz")


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_dp_same_mesh_resume_bitwise(tmp_path):
    """Baseline contract: resume on the SAME mesh is bit-identical to an
    uninterrupted run (replicated state restored + per-shard index streams
    fast-forwarded to the saved step)."""
    _needs_devices(4)
    kw = dict(COMMON, mesh_devices=4)
    a = run(experiments_dir=str(tmp_path / "a"), max_num_iters=40, **kw)
    run(experiments_dir=str(tmp_path / "b"), max_num_iters=20, **kw)
    sf = _state_file(str(tmp_path / "b"))
    with np.load(sf) as d:
        assert int(d["step"]) == 20
    c = run(experiments_dir=str(tmp_path / "c"), max_num_iters=40,
            resume_from=sf, **kw)
    assert c.num_iters_done == 40
    for x, y in zip(_leaves(a.params), _leaves(c.params)):
        np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("n_to", [2, 1])
def test_dp_elastic_resume_shrinks_mesh(tmp_path, n_to):
    """4-device DP run preempted at step 20 resumes on a SMALLER mesh (2
    devices, and down to single-device): the replicated train state loads
    exactly and training continues from step 20."""
    _needs_devices(4)
    run(experiments_dir=str(tmp_path / "a"), max_num_iters=20,
        **dict(COMMON, mesh_devices=4))
    sf = _state_file(str(tmp_path / "a"))
    st = run(experiments_dir=str(tmp_path / "b"), max_num_iters=40,
             resume_from=sf, **dict(COMMON, mesh_devices=n_to))
    assert st.num_iters_done == 40
    assert all(np.all(np.isfinite(x)) for x in _leaves(st.params))
    # the restore itself is exact: the resumed run's FIRST saved state at
    # step >= 20 descends from the saved params (smoke: metrics finite)
    assert np.isfinite(st.iter_metrics["val_mean_ce"])


def test_dp_elastic_resume_grows_mesh(tmp_path):
    """Single-device run resumes onto a 4-device mesh (scale-out after a
    bigger slice opens up)."""
    _needs_devices(4)
    run(experiments_dir=str(tmp_path / "a"), max_num_iters=20, **COMMON)
    sf = _state_file(str(tmp_path / "a"))
    st = run(experiments_dir=str(tmp_path / "b"), max_num_iters=40,
             resume_from=sf, **dict(COMMON, mesh_devices=4))
    assert st.num_iters_done == 40
    assert all(np.all(np.isfinite(x)) for x in _leaves(st.params))


LEGACY_COMMON = dict(
    ds_path="synthetic",
    num_sbs_layers=2,
    bond_dim_size=2,
    initialization="khrulkov-normal",
    learning_rate=3e-3,
    optimizer_type="rmsprop",
    batch_size=32,
    warmup_num_epochs=1,
    warmup_initial_multiplier=1e-2,
    synthetic_sizes=(128, 64),
    seed=0,
    tb_log_every_n_epochs=0,
)


def test_legacy_elastic_resume_across_meshes(tmp_path):
    """The legacy ConvSBS runner's train state is mesh-shape-free too: a
    2-device DP run resumes single-device (and the reverse) from the same
    ``train_state_latest.npz``."""
    from dctn_tpu.cli.legacy_runner import run as legacy_run

    _needs_devices(2)
    legacy_run(models_dir=str(tmp_path / "a"), epochs=2,
               **dict(LEGACY_COMMON, mesh_devices=2))
    sf = os.path.join(str(tmp_path / "a"), "train_state_latest.npz")
    p_down, _ = legacy_run(models_dir=str(tmp_path / "b"), epochs=4,
                           resume_from=sf, **LEGACY_COMMON)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(p_down))
    legacy_run(models_dir=str(tmp_path / "c"), epochs=2, **LEGACY_COMMON)
    sf1 = os.path.join(str(tmp_path / "c"), "train_state_latest.npz")
    p_up, _ = legacy_run(models_dir=str(tmp_path / "d"), epochs=4,
                         resume_from=sf1, **dict(LEGACY_COMMON, mesh_devices=2))
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(p_up))


def test_legacy_elastic_clamps_overbound_midepoch_step(tmp_path):
    """A mid-epoch save position that doesn't exist under the relaunch's step
    grid (mesh or batch size changed) is clamped to the start of that epoch
    with a logged warning, instead of silently skipping the whole epoch."""
    from dctn_tpu.cli.legacy_runner import run as legacy_run

    legacy_run(models_dir=str(tmp_path / "a"), epochs=2, **LEGACY_COMMON)
    sf = os.path.join(str(tmp_path / "a"), "train_state_latest.npz")
    with np.load(sf) as d:
        data = {k: d[k] for k in d.files}
    assert "step_in_epoch" in data and "epoch" in data
    data["step_in_epoch"] = np.int64(99)  # beyond any step grid here
    data["epoch"] = np.int64(1)
    np.savez(sf, **data)
    p, _ = legacy_run(models_dir=str(tmp_path / "b"), epochs=2,
                      resume_from=sf, **LEGACY_COMMON)
    log_text = open(os.path.join(str(tmp_path / "b"), "log.log")).read()
    assert "exceeds this configuration" in log_text
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(p))


def test_dp_elastic_restore_is_exact(tmp_path):
    """The cross-mesh RESTORE is exact, not approximate: resuming the
    4-device state for ZERO additional iterations yields bitwise-identical
    params whether the relaunch mesh is 2-device or 4-device."""
    _needs_devices(4)
    run(experiments_dir=str(tmp_path / "a"), max_num_iters=20,
        **dict(COMMON, mesh_devices=4))
    sf = _state_file(str(tmp_path / "a"))
    same = run(experiments_dir=str(tmp_path / "b"), max_num_iters=20,
               resume_from=sf, **dict(COMMON, mesh_devices=4))
    cross = run(experiments_dir=str(tmp_path / "c"), max_num_iters=20,
                resume_from=sf, **dict(COMMON, mesh_devices=2))
    assert same.num_iters_done == 20 and cross.num_iters_done == 20
    for x, y in zip(_leaves(same.params), _leaves(cross.params)):
        np.testing.assert_array_equal(x, y)
