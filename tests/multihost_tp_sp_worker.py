"""One PROCESS of a real multi-host TP / SP / SP×TP training job.

Launched twice by tests/test_multihost.py — 2 ranks over loopback, each
owning 4 local CPU devices, forming ONE global 8-device mesh via
``jax.distributed``. Each rank runs the PRODUCTION fast-layout (cmt Pallas,
interpret-mode kernels on CPU) train steps for the three model-sharded mesh
shapes the runner offers beyond DP:

  - TP     (data=4, model=2)  — last-core output dim sharded cross-process
  - SP     (data=4, space=2)  — image height sharded, halo ppermute over gloo
  - SP×TP  (data=2, space=2, model=2) — both at once

and writes loss trajectories + parameter digests (sharded leaves are
all-gathered with the multi-process-safe ``merge_tp_fast_params`` /
``_to_host``) for the parent test to compare across ranks and against
single-process 8-device runs of identical jobs. The reference is strictly
single-process (SURVEY §2.3); r3's VERDICT flagged --distributed × TP/SP as
the one untested reachable combination — this worker closes the library
half of that hole (the runner half is test_distributed_runner_tp/sp).

Usage: python multihost_tp_sp_worker.py RANK NPROC COORD_PORT OUT_JSON
"""

import hashlib
import json
import sys


def digest_of(host_arrays):
    import numpy as np

    return hashlib.sha256(
        b"".join(np.asarray(a, np.float64).tobytes() for a in host_arrays)
    ).hexdigest()


def make_job():
    """Deterministic tiny job, identical in every process (and in the
    parent's single-process oracle): cfg, fast params, synthetic batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)),
        image_size=8,
        q0=2,
        train_backend="pallas_interpret",
        eval_backend="pallas_interpret",
        dropout_p=0.8,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    fast, plans = fast_params_from_reference(params, cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 16, 8, 8, 2), jnp.float32
    )
    y = jnp.asarray(np.arange(16) % 10)
    return cfg, fast, plans, np.asarray(x), np.asarray(y)


def run_phases(mesh_for):
    """Run the three phases on meshes produced by mesh_for(kind) and return
    the result dict. Shared verbatim between the worker (global 2-process
    meshes) and the parent's single-process oracle."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dctn_tpu.parallel import (
        make_sp_fast_train_step,
        make_sp_score_fn,
        make_sp_tp_fast_train_step,
        make_sp_tp_score_fn,
        make_tp_fast_params,
        make_tp_fast_score_fn,
        make_tp_fast_train_step,
        merge_tp_fast_params,
        replicate,
        sp_shard_batch,
    )
    from dctn_tpu.parallel.data_parallel import _put_global
    from dctn_tpu.parallel.sp_tp import sp_tp_shard_batch
    from dctn_tpu.train import make_optimizer

    cfg, fast, plans, x, y = make_job()
    out = {}

    def fetch(v):
        return float(np.asarray(v.addressable_data(0)))

    # --- TP (data, model) ---
    mesh = mesh_for("tp")
    opt = make_optimizer("adam", 1e-2)
    fast3 = make_tp_fast_params(fast, cfg, mesh)
    opt_state = jax.jit(opt.init)(fast3)
    step = make_tp_fast_train_step(
        cfg, opt, plans, mesh, "epswise", 1e-4, donate=False
    )
    rng = replicate(mesh, jax.random.PRNGKey(7))
    xg = _put_global(x, NamedSharding(mesh, P(None, "data")))
    yg = _put_global(y, NamedSharding(mesh, P("data")))
    losses = []
    for i in range(2):
        fast3, opt_state, m = step(fast3, opt_state, rng, xg, yg)
        losses.append(fetch(m["loss"]))
    score = make_tp_fast_score_fn(cfg, plans, mesh, batch_size=4)
    mce, acc = score(fast3, xg, yg)
    merged = merge_tp_fast_params(fast3, cfg)
    out["tp"] = {
        "losses": losses,
        "mce": fetch(mce),
        "acc": fetch(acc),
        "digest": digest_of(jax.tree_util.tree_leaves(merged)),
        "param_sums": [
            float(np.asarray(a, np.float64).sum())
            for a in jax.tree_util.tree_leaves(merged)
        ],
    }

    # --- SP (data, space) ---
    mesh = mesh_for("sp")
    opt = make_optimizer("adam", 1e-2)
    fast_r = replicate(mesh, fast)
    opt_state = jax.jit(opt.init)(fast_r)
    step = make_sp_fast_train_step(
        cfg, opt, plans, mesh, "epswise", 1e-4, donate=False
    )
    rng = replicate(mesh, jax.random.PRNGKey(7))
    xs, ys = sp_shard_batch(mesh, x, y)
    losses = []
    for i in range(2):
        fast_r, opt_state, m = step(fast_r, opt_state, rng, xs, ys)
        losses.append(fetch(m["loss"]))
    score = make_sp_score_fn(cfg, mesh, batch_size=4, fast_plans=plans)
    mce, acc = score(fast_r, xs, ys)
    host = [
        np.asarray(a.addressable_data(0), np.float64)
        for a in jax.tree_util.tree_leaves(fast_r)
    ]
    out["sp"] = {
        "losses": losses,
        "mce": fetch(mce),
        "acc": fetch(acc),
        "digest": digest_of(host),
        "param_sums": [float(a.sum()) for a in host],
    }

    # --- SP×TP (data, space, model) ---
    mesh = mesh_for("sp_tp")
    opt = make_optimizer("adam", 1e-2)
    fast3 = make_tp_fast_params(fast, cfg, mesh)
    opt_state = jax.jit(opt.init)(fast3)
    step = make_sp_tp_fast_train_step(
        cfg, opt, plans, mesh, "epswise", 1e-4, donate=False
    )
    rng = replicate(mesh, jax.random.PRNGKey(7))
    xs, ys = sp_tp_shard_batch(mesh, x, y)
    losses = []
    for i in range(2):
        fast3, opt_state, m = step(fast3, opt_state, rng, xs, ys)
        losses.append(fetch(m["loss"]))
    score = make_sp_tp_score_fn(
        cfg, mesh, batch_size=4, params3=fast3, fast_plans=plans
    )
    mce, acc = score(fast3, sp_tp_shard_batch(mesh, x), yg2(mesh, y))
    merged = merge_tp_fast_params(fast3, cfg)
    out["sp_tp"] = {
        "losses": losses,
        "mce": fetch(mce),
        "acc": fetch(acc),
        "digest": digest_of(jax.tree_util.tree_leaves(merged)),
        "param_sums": [
            float(np.asarray(a, np.float64).sum())
            for a in jax.tree_util.tree_leaves(merged)
        ],
    }
    return out


def yg2(mesh, y):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dctn_tpu.parallel.data_parallel import _put_global

    return _put_global(y, NamedSharding(mesh, P("data")))


def main() -> None:
    rank, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_enable_x64", True)

    from dctn_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(f"127.0.0.1:{port}", nproc, rank)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    assert len(jax.local_devices()) == 4

    from dctn_tpu.parallel import make_sp_mesh, make_tp_mesh
    from dctn_tpu.parallel.sp_tp import make_sp_tp_mesh

    def mesh_for(kind):
        return {
            "tp": lambda: make_tp_mesh(4, 2),
            "sp": lambda: make_sp_mesh(4, 2),
            "sp_tp": lambda: make_sp_tp_mesh(2, 2, 2),
        }[kind]()

    out = run_phases(mesh_for)
    out["rank"] = rank
    out["process_count"] = jax.process_count()
    out["device_count"] = jax.device_count()
    with open(out_path, "w") as f:
        json.dump(out, f)

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dctn_tpu_tp_sp_multihost_done")


if __name__ == "__main__":
    main()
