"""Batch-sharded data-parallel training and evaluation via shard_map.

Design (SURVEY §2.3 / §7.3 — the component the reference lacks entirely):

- The DATASET is sharded along its sample axis across the ``data`` mesh axis:
  each device holds N/ndev samples in its own HBM, so capacity scales with
  the slice. Per-step batch indices are drawn PER SHARD on the host (shape
  (ndev, per_device_batch), values local to each shard) and each device
  gathers its sub-batch locally — zero data movement over ICI for inputs.
- PARAMETERS and optimizer state are replicated. Each device computes the
  loss/grads of its sub-batch; gradients are averaged with ``jax.lax.pmean``
  over the axis (one ICI all-reduce per step — the only collective in the hot
  path), then the identical optimizer update runs everywhere. The dropout key
  is replicated so every device draws the SAME parameter mask (dropout masks
  parameters, not activations).
- Evaluation shards the split the same way and psums (ce_sum, correct).

With per-device batch b, global batch = ndev·b: numerically this matches
single-device training on the global batch exactly (mean-CE gradients are
pmean'd; regularizer gradients are identical on every device and unaffected
by pmean since pmean of identical values is the value).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.eps_plus_linear import (
    EPSesPlusLinearConfig,
    eps_plus_linear_forward,
)
from ..train.step import REGULARIZERS, grad_accum_scan, make_fast_reg_fn


# ---------------------------------------------------------------------------
# dataset sharding


def _put_global(x, sharding: NamedSharding):
    """Place a host array onto a (possibly multi-process) mesh.

    Single-process meshes use ``jax.device_put``. When the mesh spans
    multiple processes (multi-host DCN training brought up by
    ``mesh.initialize_distributed`` — docs/multihost.md, tested end-to-end
    cross-process in tests/test_multihost.py), ``device_put`` cannot address
    remote devices; instead every process calls this with the IDENTICAL
    full global array and ``jax.make_array_from_callback`` materializes only
    the shards owned by this process's addressable devices. This keeps the
    single-host and multi-host call sites byte-for-byte the same — the
    data-parallel analog of the reference's single-process ``.to(device)``
    (dctn/dataset_loading.py:323)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


@dataclasses.dataclass
class ShardedSplit:
    """A split laid out across the mesh: x (C, ndev·n_local, H, W, Q) sharded
    on dim 1, y (ndev·n_local,) sharded on dim 0. ``n_valid`` is the true
    sample count before padding to a multiple of ndev."""

    x: jax.Array
    y: jax.Array
    n_valid: int
    n_local: int
    mesh: Mesh


def shard_split(mesh: Mesh, x: np.ndarray, y: np.ndarray) -> ShardedSplit:
    """Pad N to a multiple of the mesh size and place shards on devices."""
    ndev = mesh.devices.size
    n = y.shape[0]
    n_pad = (-n) % ndev
    if n_pad:
        x = np.concatenate([x, np.repeat(x[:, :1], n_pad, axis=1)], axis=1)
        y = np.concatenate([y, np.repeat(y[:1], n_pad, axis=0)], axis=0)
    xs = _put_global(x, NamedSharding(mesh, P(None, "data")))
    ys = _put_global(y, NamedSharding(mesh, P("data")))
    return ShardedSplit(xs, ys, n_valid=n, n_local=y.shape[0] // ndev, mesh=mesh)


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(lambda a: _put_global(a, sharding), tree)


# ---------------------------------------------------------------------------
# training step


def _make_parallel_step_from_fns(
    forward_fn,  # (params, xb, rng) -> logits, training mode
    reg_fn,  # params -> scalar
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    reg_coeff: float = 0.0,
    frozen_eps_indices: Sequence[int] = (),
    eps_leaves_key: str = "epses",
    donate: bool = True,
    with_probs: bool = False,
    grad_accum_steps: int = 1,
):
    """Model-layout-agnostic DP step builder: the reference-layout, fast
    (cmt) and ConvSBS steps all share this body — they differ only in the
    forward, the regularizer, and which pytree key holds the freezable
    cores.

    ``grad_accum_steps`` microbatches each device's sub-batch through
    ``train.step.grad_accum_scan`` BEFORE the pmean all-reduce (still one
    collective per step). Besides bounding activation memory, this is the
    DP form of the large-batch recipe (docs/performance.md): microbatch
    saved-t buffers stay transient and under the HBM cap, keeping the
    2-matmul backward at huge per-device batches (+22% measured at bs 8192
    single-chip)."""
    frozen = frozenset(frozen_eps_indices)

    def local_loss(params, xb, yb, rng):
        logits = forward_fn(params, xb, rng)
        logp = jax.nn.log_softmax(logits, axis=-1)
        logp_true = jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
        ce = -jnp.mean(logp_true)
        reg = reg_fn(params) if reg_coeff != 0.0 else jnp.zeros((), logits.dtype)
        return ce + reg_coeff * reg, (ce, reg, jnp.exp(logp_true))

    def mask_frozen(grads):
        if not frozen:
            return grads
        cores = tuple(
            jnp.zeros_like(g) if i in frozen else g
            for i, g in enumerate(grads[eps_leaves_key])
        )
        return {**grads, eps_leaves_key: cores}

    def per_device(params, opt_state, rng, x_shard, y_shard, idx_shard):
        # x_shard: (C, n_local, H, W, Q); idx_shard: (1, b) — this device's row
        xb = jnp.take(x_shard, idx_shard[0], axis=1)
        yb = jnp.take(y_shard, idx_shard[0], axis=0)
        if grad_accum_steps == 1:
            (loss, (ce, reg, probs)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, xb, yb, rng)
        elif with_probs:
            # per-microbatch probs concatenate back to batch order — the
            # tb-batches hook composes with gradient accumulation
            loss, ce, reg, grads, probs = grad_accum_scan(
                local_loss, params, xb, yb, rng, grad_accum_steps,
                with_probs=True,
            )
        else:
            loss, ce, reg, grads = grad_accum_scan(
                local_loss, params, xb, yb, rng, grad_accum_steps
            )
            probs = jnp.zeros((yb.shape[0],), loss.dtype)  # DCE'd (gated off)
        # ONE collective: average gradients over the data axis (ICI all-reduce)
        grads = jax.lax.pmean(grads, "data")
        grads = mask_frozen(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": jax.lax.pmean(loss, "data"),
            "ce": jax.lax.pmean(ce, "data"),
            "reg_term": reg,  # identical on all devices
        }
        return params, opt_state, metrics, probs

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "data"), P("data"), P("data")),
        out_specs=(P(), P(), P(), P("data")),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, rng, x, y, local_idx):
        params, opt_state, metrics, probs = sharded(
            params, opt_state, rng, x, y, local_idx
        )
        if with_probs:
            metrics = {**metrics, "probs_of_true_class": probs}
        return params, opt_state, metrics

    return step


def make_parallel_train_step(
    cfg: EPSesPlusLinearConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    reg_type: str = "epses_composition",
    reg_coeff: float = 0.0,
    frozen_eps_indices: Sequence[int] = (),
    donate: bool = True,
    with_probs: bool = False,
    grad_accum_steps: int = 1,
):
    """Returns step(params, opt_state, rng, sharded_x, sharded_y, local_idx)
    → (params, opt_state, metrics).

    ``local_idx``: (ndev, per_device_batch) int32, sharded over dim 0; row d
    holds positions into device d's LOCAL shard of the split.

    ``with_probs``: additionally return ``metrics["probs_of_true_class"]`` —
    the per-example softmax probability of the true label, laid out
    device-major (matching ``local_idx.reshape(-1)``) and sharded P("data"),
    so the DP path can feed TB batch imagery like the single-device path.
    """
    return _make_parallel_step_from_fns(
        lambda p, xb, rng: eps_plus_linear_forward(
            p, xb, cfg, training=True, rng=rng
        ),
        REGULARIZERS[reg_type],
        optimizer, mesh, reg_coeff, frozen_eps_indices, "epses",
        donate, with_probs, grad_accum_steps,
    )


def make_parallel_fast_train_step(
    cfg: EPSesPlusLinearConfig,
    optimizer: optax.GradientTransformation,
    plans,
    mesh: Mesh,
    reg_type: str = "epswise",
    reg_coeff: float = 0.0,
    frozen_eps_indices: Sequence[int] = (),
    donate: bool = True,
    with_probs: bool = False,
    grad_accum_steps: int = 1,
    qat=None,
):
    """The DP step over the FAST (cmt) parameter layout — the flagship
    single-chip path (19.75k img/s, cores stored matricized) running
    unchanged inside shard_map: replicated cmt params, per-shard Pallas
    pipeline, one pmean gradient all-reduce. The per-step plans are static,
    the replicated dropout key draws the same reference-order mask
    everywhere, and trajectories match the single-device fast step up to
    the CE-mean summation order (tests/test_parallel.py).

    ``qat="int8"`` swaps each shard's forward for the W8A8 int8 kernel with
    straight-through gradients (pallas/eps_pallas_q8.forward_fast_q8train);
    the STE backward and the pmean all-reduce compose unchanged — quantizers
    are per-shard-local (per weight row / per pixel column), and the saved-t
    STE decision is made on the GLOBAL pixel count (``pixel_scale`` = mesh
    size, see ``qat_save_decision``), so the averaged gradient equals the
    single-device QAT step's on the concatenated batch."""
    from ..models.eps_plus_linear import eps_plus_linear_forward_fast

    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    if qat == "int8":
        from ..pallas.eps_pallas_q8 import forward_fast_q8train

        ndev = int(mesh.devices.size)

        def _fwd(f, xb, cfg, plans, training, rng):
            return forward_fast_q8train(
                f, xb, cfg, plans, training=training, rng=rng,
                pixel_scale=ndev,
            )
    else:
        _fwd = eps_plus_linear_forward_fast

    return _make_parallel_step_from_fns(
        lambda f, xb, rng: _fwd(
            f, xb, cfg, plans, training=True, rng=rng
        ),
        make_fast_reg_fn(cfg, plans, reg_type),
        optimizer, mesh, reg_coeff, frozen_eps_indices, "epses_cmt",
        donate, with_probs, grad_accum_steps,
    )


def make_local_index_stream(
    split: ShardedSplit, per_device_batch: int, seed: int = 0
):
    """Infinite stream of (ndev, per_device_batch) local index arrays.

    Each device's row is an independent within-shard shuffle (epoch-wise,
    drop-last), the scalable DP analog of the reference's global shuffle.
    Padding rows (beyond n_valid) are excluded from sampling."""
    ndev = split.mesh.devices.size
    n_local = split.n_local
    # device d holds samples [d*n_local, (d+1)*n_local); the valid count in
    # shard d:
    valid_per_shard = [
        max(0, min(split.n_valid - d * n_local, n_local)) for d in range(ndev)
    ]
    rngs = [np.random.default_rng(seed * 1000003 + d) for d in range(ndev)]
    orders = [rngs[d].permutation(valid_per_shard[d]) for d in range(ndev)]
    cursors = [0] * ndev

    def next_batch() -> np.ndarray:
        out = np.empty((ndev, per_device_batch), np.int32)
        for d in range(ndev):
            if cursors[d] + per_device_batch > len(orders[d]):
                orders[d] = rngs[d].permutation(valid_per_shard[d])
                cursors[d] = 0
            out[d] = orders[d][cursors[d] : cursors[d] + per_device_batch]
            cursors[d] += per_device_batch
        return out

    while True:
        yield next_batch()


# ---------------------------------------------------------------------------
# pixel-batch models (the ConvSBS legacy family): x is (N, H, W) sharded on
# dim 0 — DP for the model family the reference trained single-device
# (mnist.py:169-284). The machinery is the same (replicated params, local
# sub-batch gather, one pmean all-reduce); only the sample axis and the
# absence of a dropout key differ.


def shard_pixel_split(mesh: Mesh, x: np.ndarray, y: np.ndarray) -> ShardedSplit:
    """Pad N to a multiple of the mesh size and place (N, H, W) pixel shards
    on devices (sample axis 0)."""
    ndev = mesh.devices.size
    n = y.shape[0]
    n_pad = (-n) % ndev
    if n_pad:
        x = np.concatenate([x, np.repeat(x[:1], n_pad, axis=0)], axis=0)
        y = np.concatenate([y, np.repeat(y[:1], n_pad, axis=0)], axis=0)
    xs = _put_global(x, NamedSharding(mesh, P("data")))
    ys = _put_global(y, NamedSharding(mesh, P("data")))
    return ShardedSplit(xs, ys, n_valid=n, n_local=y.shape[0] // ndev, mesh=mesh)


def make_parallel_pixel_train_step(
    forward_fn,  # (params, xb) -> logits; xb (b, H, W)
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
):
    """DP step for pixel-batch models: step(params, opt_state, sharded_x,
    sharded_y, local_idx) → (params, opt_state, mean_loss)."""

    def per_device(params, opt_state, x_shard, y_shard, idx_shard):
        xb = jnp.take(x_shard, idx_shard[0], axis=0)
        yb = jnp.take(y_shard, idx_shard[0], axis=0)

        def loss_fn(p):
            logits = forward_fn(p, xb)
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, yb[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jax.lax.pmean(loss, "data")

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, x, y, local_idx):
        return sharded(params, opt_state, x, y, local_idx)

    return step


def make_parallel_pixel_score_fn(forward_fn, mesh: Mesh, batch_size: int):
    """score(params, sharded_pixel_split) → (mean_ce, acc), the pixel-batch
    analog of make_parallel_score_fn."""
    from ..train.evaluation import masked_ce_acc_scan, padded_batch_ids

    def per_device(params, x_shard, y_shard, n_valid_arr):
        n_local = y_shard.shape[0]
        base = jax.lax.axis_index("data") * n_local
        ids, in_range = padded_batch_ids(n_local, batch_size)
        valid = in_range & (base + ids < n_valid_arr[0])
        ce_sum, correct = masked_ce_acc_scan(
            lambda xb: forward_fn(params, xb),
            x_shard, y_shard, ids, valid, sample_axis=0,
        )
        return jax.lax.psum(ce_sum, "data"), jax.lax.psum(correct, "data")

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def score(params, x, y, n_valid_arr):
        ce_sum, correct = sharded(params, x, y, n_valid_arr)
        n = n_valid_arr[0].astype(jnp.float32)
        return ce_sum / n, correct.astype(jnp.float32) / n

    def score_split(params, split: ShardedSplit):
        # host numpy, NOT jnp: a locally-committed device array cannot
        # be auto-replicated onto a multi-process mesh (test_multihost)
        n_valid_arr = np.asarray([split.n_valid], np.int32)
        return score(params, split.x, split.y, n_valid_arr)

    return score_split


def make_parallel_predict_fn(
    cfg: EPSesPlusLinearConfig, mesh: Mesh, batch_size: int, forward_fn=None
):
    """predict(params, sharded_split) → int32 np.ndarray of argmax class ids
    (n_valid,) — the serving analog of ``make_parallel_score_fn``. Each
    device scans its local shard in padded fixed-size batches inside ONE
    shard_map (no per-batch host round trips); only the class ids leave the
    device (tiny ints — critical through the ~450 KB/s relay). The reference
    has no serving surface at all (SURVEY §2.2); its nearest analog is the
    single-device batch evaluation in
    ``small_experiments/pre_publishing_test_evaluation/*.py``."""
    from ..train.evaluation import padded_batch_ids

    if forward_fn is None:
        forward_fn = lambda p, xb: eps_plus_linear_forward(  # noqa: E731
            p, xb, cfg, training=False
        )

    def per_device(params, x_shard):
        n_local = x_shard.shape[1]
        ids, _ = padded_batch_ids(n_local, batch_size)

        def body(carry, batch_ids):
            xb = jnp.take(x_shard, batch_ids, axis=1)
            preds = jnp.argmax(forward_fn(params, xb), axis=1)
            return carry, preds.astype(jnp.int32)

        _, preds = jax.lax.scan(body, jnp.zeros((), jnp.int32), ids)
        # un-pad back to local order: clamped ids can repeat, but every
        # write for a given id carries the same prediction
        out = jnp.zeros((n_local,), jnp.int32)
        return out.at[ids.reshape(-1)].set(preds.reshape(-1))

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(None, "data")),
        out_specs=P("data"),
        check_vma=False,
    )
    predict = jax.jit(sharded)

    def predict_split(params, split: ShardedSplit) -> np.ndarray:
        return np.asarray(predict(params, split.x))[: split.n_valid]

    return predict_split


# ---------------------------------------------------------------------------
# evaluation


def make_parallel_score_fn(
    cfg: EPSesPlusLinearConfig, mesh: Mesh, batch_size: int, forward_fn=None
):
    """score(params, sharded_split) → (mean_ce, acc) with per-device scans and
    a final psum. Padding samples are masked out by global position.
    ``forward_fn(params, xb) → logits`` overrides the default eval forward
    (the fast-layout and ConvSBS DP paths pass theirs)."""

    from ..train.evaluation import masked_ce_acc_scan, padded_batch_ids

    if forward_fn is None:
        forward_fn = lambda p, xb: eps_plus_linear_forward(  # noqa: E731
            p, xb, cfg, training=False
        )

    def per_device(params, x_shard, y_shard, n_valid_arr):
        n_local = y_shard.shape[0]
        d = jax.lax.axis_index("data")
        base = d * n_local
        ids, in_range = padded_batch_ids(n_local, batch_size)
        valid = in_range & (base + ids < n_valid_arr[0])
        ce_sum, correct = masked_ce_acc_scan(
            lambda xb: forward_fn(params, xb),
            x_shard, y_shard, ids, valid,
        )
        return jax.lax.psum(ce_sum, "data"), jax.lax.psum(correct, "data")

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(None, "data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def score(params, x, y, n_valid_arr):
        ce_sum, correct = sharded(params, x, y, n_valid_arr)
        n = n_valid_arr[0].astype(jnp.float32)
        return ce_sum / n, correct.astype(jnp.float32) / n

    def score_split(params, split: ShardedSplit):
        # host numpy, NOT jnp: a locally-committed device array cannot
        # be auto-replicated onto a multi-process mesh (test_multihost)
        n_valid_arr = np.asarray([split.n_valid], np.int32)
        return score(params, split.x, split.y, n_valid_arr)

    return score_split
