"""One PROCESS of a real multi-host (multi-controller) DP training job.

Launched twice by tests/test_multihost.py — 2 ranks over loopback, each
owning 2 local CPU devices, forming ONE global 4-device ``data`` mesh via
``jax.distributed`` (the DCN bring-up path of docs/multihost.md that a TPU
pod would use, exercised here for real instead of being documentation-only).
Each rank runs the PRODUCTION data-parallel step
(``parallel/data_parallel.py`` — cross-process gradient pmean over gloo)
for several steps on identical synthetic data, then writes its loss
trajectory and a parameter digest for the parent test to compare across
ranks and against a single-process run. The reference is strictly
single-process/single-device (SURVEY §2.3, lr_gridsearch.py:68-87 is its
only multi-device mechanism).

Usage: python multihost_worker.py RANK NPROC COORD_PORT OUT_JSON
"""

import hashlib
import json
import sys


def main() -> None:
    rank, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]

    import jax

    # Before ANY backend use: virtual CPU devices (the axon sitecustomize
    # pins the platform via env, so this must be the in-process dance —
    # see .claude/skills/verify/SKILL.md).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_enable_x64", True)

    from dctn_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(f"127.0.0.1:{port}", nproc, rank)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 2

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dctn_tpu.data import load_dataset
    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.parallel import (
        make_parallel_score_fn,
        make_parallel_train_step,
        replicate,
        shard_split,
    )
    from dctn_tpu.parallel.data_parallel import _put_global
    from dctn_tpu.train import make_optimizer

    # Identical in every process: synthetic data + init are pure functions
    # of fixed seeds.
    splits = load_dataset(
        "mnist", "synthetic", synthetic_sizes=(64, 16, 16), phi_multiplier=1.0
    )
    cfg = EPSesPlusLinearConfig(epses_specs=((3, 4),), image_size=28, q0=2)
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)

    ndev = 2 * nproc
    mesh = make_mesh(ndev)
    split = shard_split(mesh, splits.train.x, np.asarray(splits.train.y))
    params = replicate(mesh, params)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)

    step = make_parallel_train_step(
        cfg, opt, mesh, reg_type="epses_composition", reg_coeff=1e-6,
        donate=False,
    )
    rng = replicate(mesh, jax.random.PRNGKey(7))

    losses = []
    for i in range(5):
        idx = (np.arange(ndev * 4, dtype=np.int32) + 3 * i) % split.n_local
        local_idx = _put_global(
            idx.reshape(ndev, 4), NamedSharding(mesh, P("data", None))
        )
        params, opt_state, metrics = step(
            params, opt_state, rng, split.x, split.y, local_idx
        )
        losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))

    score = make_parallel_score_fn(cfg, mesh, batch_size=8)
    val = shard_split(mesh, splits.val.x, np.asarray(splits.val.y))
    mce, acc = score(params, val)
    mce = float(np.asarray(mce.addressable_data(0)))
    acc = float(np.asarray(acc.addressable_data(0)))

    leaves = jax.tree_util.tree_leaves(params)
    host = [np.asarray(l.addressable_data(0), dtype=np.float64) for l in leaves]
    digest = hashlib.sha256(b"".join(a.tobytes() for a in host)).hexdigest()
    param_sums = [float(a.sum()) for a in host]

    # Phase 2: the FLAGSHIP fast (cmt) Pallas pipeline cross-process
    # (interpret-mode kernels on CPU), with parameter dropout — the path a
    # real multi-host pod would run.
    import dataclasses

    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
    from dctn_tpu.parallel import make_parallel_fast_train_step

    cfg_f = dataclasses.replace(
        cfg, train_backend="pallas_interpret",
        eval_backend="pallas_interpret", dropout_p=0.8,
    )
    params_f = init_eps_plus_linear(jax.random.PRNGKey(0), cfg_f)
    fast, plans = fast_params_from_reference(params_f, cfg_f)
    # replicate BEFORE opt.init so the moments inherit the global sharding
    # (locally-committed arrays cannot auto-replicate across processes)
    fast = replicate(mesh, fast)
    opt_state_f = opt.init(fast)
    step_f = make_parallel_fast_train_step(
        cfg_f, opt, plans, mesh, "epswise", 1e-4, donate=False
    )
    fast_losses = []
    for i in range(2):
        idx = (np.arange(ndev * 4, dtype=np.int32) + 5 * i) % split.n_local
        local_idx = _put_global(
            idx.reshape(ndev, 4), NamedSharding(mesh, P("data", None))
        )
        fast, opt_state_f, m = step_f(
            fast, opt_state_f, rng, split.x, split.y, local_idx
        )
        fast_losses.append(float(np.asarray(m["loss"].addressable_data(0))))
    fast_host = [
        np.asarray(l.addressable_data(0), dtype=np.float64)
        for l in jax.tree_util.tree_leaves(fast)
    ]
    fast_digest = hashlib.sha256(
        b"".join(a.tobytes() for a in fast_host)
    ).hexdigest()

    with open(out_path, "w") as f:
        json.dump(
            {
                "rank": rank,
                "process_count": jax.process_count(),
                "device_count": jax.device_count(),
                "losses": losses,
                "val_mce": mce,
                "val_acc": acc,
                "param_digest": digest,
                "param_sums": param_sums,
                "fast_losses": fast_losses,
                "fast_digest": fast_digest,
            },
            f,
        )

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dctn_tpu_multihost_done")


if __name__ == "__main__":
    main()
