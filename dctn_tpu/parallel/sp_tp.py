"""SP x TP composition for EPSesPlusLinear: one mesh with ``data``,
``space`` and ``model`` axes — batch-sharded, image-height-sharded (halo
exchange per EPS layer) AND last-core-output-dim-sharded at the same time.

Why this module exists: ``spatial_parallel.py`` shards activations (the
B·H·W·Q^n1 scaling) and ``tensor_parallel.py`` shards the widest layer's
parameters/compute (large Q_out); a model that is big in BOTH dimensions
needs them together. The reference (dctn/eps_plus_linear.py +
dctn/training.py) is strictly single-device — this whole axis algebra is
the framework's beyond-reference parallel layer (SURVEY §2.3).

Composition rules (each inherited from its parent module and orthogonal by
construction):

- Forward: every EPS layer first pulls its K−1-row halo over ``space``
  (nearest-neighbor ppermute, custom-VJP transpose —
  spatial_parallel._halo_pull), then contracts. Early cores are replicated;
  the LAST core is O-sharded over ``model`` so each shard computes its own
  output slice of its own rows. The classifier weight, kept 3-D
  (H'·W', O, classes) with its O dim sharded over ``model``
  (tensor_parallel layout), is additionally h-sliced per ``space`` device
  (zero-padded rows, spatial_parallel layout): each device contracts a
  disjoint (h-range × O-slice) block, and ONE value-only psum over
  ("space", "model") rebuilds the logits. The bias enters after the psum.
- Dropout: masks are drawn with the single-device key chain over FULL core
  shapes from the replicated rng (every space shard sees the identical
  realization), and the sharded last core slices its O-range — exactly
  tensor_parallel's discipline, which makes SP x TP training at p<1
  bit-identical to single-device training.
- Gradients (shard_maps run check_vma=False; every cross-device edge
  carries an explicit custom-VJP transpose):
    * early (fully replicated) cores: each device holds the contribution of
      its rows × its O-slice route → psum over ("space", "model");
    * the last core's O-slice: exact per model shard (the logits psum is
      value-only), partial over rows → psum over ``space`` only;
    * classifier w3: (h, O)-slices are disjoint → psum over ``space``
      reassembles the rows, the model axis keeps its own O-slice;
    * bias: full everywhere (enters after the psum) — no reduction;
    * everything then pmean over ``data``.
  The regularizer is computed with tensor_parallel's per-model-shard
  partials (``_local_regularizer`` / ``_tp_fast_local_regularizer`` — full
  VALUE via a value-only model psum) and divided by the space axis size in
  the local loss, so the psum rules above reconstruct its gradient exactly
  once (spatial_parallel's discipline).

Scope: last-core TP only. ``shard_all`` x SP is refused by the runner — its
inter-layer all_gathers would have to interleave with the halo ppermutes
per layer, and no recorded model family is simultaneously deep, wide and
high-resolution enough to want both (the deepest recorded config is 3
layers, three_epses_on_fashionmnist.py).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.eps_plus_linear import EPSesPlusLinearConfig
from ..ops import eps as eps_mod
from ..train.step import grad_accum_scan
from .spatial_parallel import _with_halo, pad_rows, sp_check_config
from .data_parallel import _put_global
from .tensor_parallel import (
    _local_regularizer,
    _psum_value_only,
    _tp_fast_local_regularizer,
    _tp_specs,
    _tp_fast_specs,
)


def make_sp_tp_mesh(
    n_data: int, n_space: int, n_model: int, devices=None
) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = n_data * n_space * n_model
    assert devices.size >= n
    return Mesh(
        devices[:n].reshape(n_data, n_space, n_model),
        axis_names=("data", "space", "model"),
    )


def sp_tp_shard_batch(mesh: Mesh, x, y=None):
    """Batch (C, B, H, W, Q) → height-padded, placed P(None, data, space)
    (replicated over ``model``); labels (B,) → P(data)."""
    n_space = mesh.shape["space"]
    xp = pad_rows(np.asarray(x), n_space)
    xs = _put_global(xp, NamedSharding(mesh, P(None, "data", "space")))
    if y is None:
        return xs
    ys = _put_global(np.asarray(y), NamedSharding(mesh, P("data")))
    return xs, ys


# ---------------------------------------------------------------------------
# reference layout


def _sp_tp_classifier(feats, linear, cfg, hl, n_space):
    """feats (B, hl, W', O_loc) — this device's rows × its O-slice. w3
    (H'·W', O_loc, classes) is h-padded/sliced like spatial_parallel's
    classifier; the logits psum runs over BOTH axes."""
    b, _, wl, o_loc = feats.shape
    v = cfg.pre_linear_image_size
    d = jax.lax.axis_index("space")
    w4 = linear["w3"].reshape(v, wl, o_loc, cfg.num_classes)
    w4 = jnp.pad(w4, ((0, n_space * hl - v), (0, 0), (0, 0), (0, 0)))
    w_loc = jax.lax.dynamic_slice_in_dim(w4, d * hl, hl, axis=0)
    partial_logits = jax.lax.dot_general(
        feats.reshape(b, hl * wl * o_loc),
        w_loc.reshape(hl * wl * o_loc, cfg.num_classes),
        (((1,), (0,)), ((), ())),
    )
    return _psum_value_only(partial_logits, ("space", "model")) + linear["b"]


def _sp_tp_forward_local(
    params3, xb, cfg: EPSesPlusLinearConfig, training, rng, n_space, hl,
    n_model,
):
    """Per-(data, space, model)-shard forward: xb (C, B, hl, W, Q) → full
    logits (B, classes) on every shard."""
    epses = params3["epses"]
    n_eps = len(epses)
    if cfg.dropout_p < 1.0 and training:
        m = jax.lax.axis_index("model")
        keys = jax.random.split(rng, n_eps)
        masked = []
        for i, (c, k) in enumerate(zip(epses, keys)):
            if i == n_eps - 1 and n_model > 1:
                o_loc = c.shape[-1]
                full = c.shape[:-1] + (o_loc * n_model,)
                mask = jax.random.bernoulli(k, cfg.dropout_p, full).astype(
                    c.dtype
                )
                mask = jax.lax.dynamic_slice_in_dim(
                    mask, m * o_loc, o_loc, axis=c.ndim - 1
                )
            else:
                mask = jax.random.bernoulli(k, cfg.dropout_p, c.shape).astype(
                    c.dtype
                )
            masked.append(c * mask / cfg.dropout_p)
        epses = tuple(masked)
    backend = cfg.train_backend if training else cfg.eval_backend
    h = xb
    for core in epses:
        c = h.shape[0]
        k = eps_mod._infer_kernel_size(core, c)
        h_ext = _with_halo(h, k, n_space, row_axis=2)
        h = eps_mod.eps(
            core, h_ext, compute_dtype=cfg.compute_dtype, backend=backend
        )[None]
    return _sp_tp_classifier(h[0], params3["linear"], cfg, hl, n_space)


def _reduce_grads(grads, frozen, n_eps):
    """The composed reduction table from the module docstring. Works on
    both layouts (``epses`` reference cores / ``epses_cmt`` fast cmts)."""
    key = "epses" if "epses" in grads else "epses_cmt"
    return {
        key: tuple(
            jnp.zeros_like(g)
            if i in frozen
            else jax.lax.psum(
                g, "space" if i == n_eps - 1 else ("space", "model")
            )
            for i, g in enumerate(grads[key])
        ),
        "linear": {
            "w3": jax.lax.psum(grads["linear"]["w3"], "space"),
            "b": grads["linear"]["b"],
        },
    }


def make_sp_tp_train_step(
    cfg: EPSesPlusLinearConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    reg_type: str = "epses_composition",
    reg_coeff: float = 0.0,
    frozen_eps_indices: Sequence[int] = (),
    donate: bool = False,
    grad_accum_steps: int = 1,
    with_probs: bool = False,
):
    """step(params3, opt_state, rng, xb, yb) over a ("data", "space",
    "model") mesh: xb P(None, data, space), yb P(data), params in the TP
    layout (make_tp_params on this mesh). The optimizer update runs outside
    the shard_map (GSPMD propagates the parameter shardings into the
    elementwise update). Trajectory-exact vs single-device training
    (tests/test_sp_tp.py). ``with_probs``: per-sample true-class
    probabilities gathered over ``data`` (logits are full on every shard
    after the (space, model) psum) — the tb-batches hook."""
    n_space = mesh.shape["space"]
    n_model = mesh.shape["model"]
    hl = sp_check_config(cfg, n_space)
    frozen = frozenset(frozen_eps_indices)

    def per_shard(params3, rng, xb, yb):
        def local_loss(p3, xs, ys, r):
            logits = _sp_tp_forward_local(
                p3, xs, cfg, True, r, n_space, hl, n_model
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            per_sample = jnp.take_along_axis(logp, ys[:, None], axis=1)[:, 0]
            ce = -jnp.mean(per_sample)
            # full reg VALUE (value-only model psum inside), local gradient
            # = per-model-shard partial; /n_space so the space psum
            # reconstructs the gradient exactly once
            reg = (
                _local_regularizer(p3, reg_type, n_model, shard_all=False)
                if reg_coeff != 0.0
                else jnp.zeros((), logits.dtype)
            )
            return ce + reg_coeff * reg / n_space, (ce, reg, jnp.exp(per_sample))

        if grad_accum_steps == 1:
            (_, (ce, reg, probs)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params3, xb, yb, rng)
        elif with_probs:
            _, ce, reg, grads, probs = grad_accum_scan(
                local_loss, params3, xb, yb, rng, grad_accum_steps,
                with_probs=True,
            )
        else:
            _, ce, reg, grads = grad_accum_scan(
                local_loss, params3, xb, yb, rng, grad_accum_steps
            )
        grads = jax.lax.pmean(
            _reduce_grads(grads, frozen, len(params3["epses"])), "data"
        )
        metrics = {
            "loss": jax.lax.pmean(ce, "data") + reg_coeff * reg,
            "ce": jax.lax.pmean(ce, "data"),
            "reg_term": reg,
        }
        if with_probs:
            return grads, metrics, probs
        return grads, metrics, jnp.zeros((0,), jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params3, opt_state, rng, xb, yb):
        p_specs = _tp_specs(params3, shard_all=False)
        grads, metrics, probs = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(p_specs, P(), P(None, "data", "space"), P("data")),
            out_specs=(p_specs, P(), P("data")),
            check_vma=False,
        )(params3, rng, xb, yb)
        updates, opt_state = optimizer.update(grads, opt_state, params3)
        params3 = optax.apply_updates(params3, updates)
        if with_probs:
            metrics["probs_of_true_class"] = probs
        return params3, opt_state, metrics

    return step


# ---------------------------------------------------------------------------
# fast (cmt) layout: the flagship Pallas pipeline per (row-shard, O-shard)


def _sp_tp_fast_forward_local(
    fast3, xb, cfg: EPSesPlusLinearConfig, plans, training, rng, n_space, hl,
    n_model, qat=None, ndata=1,
):
    """Transposed batch-minor pipeline per device: halo on the middle row
    dim (spatial_parallel), last layer at out_size = O/n_model on its
    contiguous cmt row block (tensor_parallel), classifier sliced on BOTH
    h (space) and O (model). ``qat="int8"`` runs every layer through the
    W8A8 STE forward — both quantizers are shard-local on this mesh (weights
    per-row over the O-block, activations per-pixel-column over the local
    h-range), so composed SP×TP QAT reproduces single-device QAT numerics
    (see apply_q8train_layer's docstring)."""
    from ..models.eps_plus_linear import _dropout_cmts
    from ..pallas.eps_pallas import (
        _core_to_cmt_k,
        _kernel_dims,
        eps_pallas_apply_t_cmt,
        plan_pallas_call,
    )

    cmts = fast3["epses_cmt"]
    n_eps = len(cmts)
    backend = cfg.train_backend if training else cfg.eval_backend
    assert backend in ("pallas", "pallas_interpret"), (
        "fast params run only on the Pallas pipeline"
    )
    interpret = backend == "pallas_interpret"
    if cfg.dropout_p < 1.0 and training:
        # reference-order full-shape masks → cmt → slice the local rows
        # (tensor_parallel._tp_fast_forward_local's discipline)
        m = jax.lax.axis_index("model")
        keys = jax.random.split(rng, n_eps)
        masked = []
        for i, (cmt, plan, k) in enumerate(zip(cmts, plans, keys)):
            mask = jax.random.bernoulli(k, cfg.dropout_p, plan["core_shape"])
            _, q_k, n1_k = _kernel_dims(
                plan["c"], plan["q"], plan["kernel_size"], plan["n1"],
                plan["merge_pairs"],
            )
            mask_cmt = _core_to_cmt_k(mask, n1_k, q_k).astype(cmt.dtype)
            if i == n_eps - 1 and n_model > 1:
                rows_loc = cmt.shape[0]
                mask_cmt = jax.lax.dynamic_slice_in_dim(
                    mask_cmt, m * rows_loc, rows_loc, axis=0
                )
            masked.append(cmt * mask_cmt / cfg.dropout_p)
        cmts = tuple(masked)
    c0, b, _, w, q0 = xb.shape
    xT = jnp.transpose(xb, (0, 4, 2, 3, 1))  # (C, Q, hl, W, B)
    ch, qq, ww = c0, q0, w
    hg = cfg.image_size  # unsharded valid height, for the QAT save decision
    outT = None
    for i, (cmt, p) in enumerate(zip(cmts, plans)):
        k_, out_full = p["kernel_size"], p["out_size"]
        o_i = out_full // n_model if i == n_eps - 1 else out_full
        xT = _with_halo(xT, k_, n_space, row_axis=2)
        wp = ww - k_ + 1
        hg -= k_ - 1
        if qat == "int8":
            from ..pallas.eps_pallas_q8 import apply_q8train_layer

            # saved-t STE decision on the GLOBAL (full O, full valid
            # H'·W'·B) shapes — see qat_save_decision
            outT = apply_q8train_layer(
                cmt, xT, p, cfg.compute_dtype, interpret, i == 0,
                out_size=o_i,
                save_shapes=(out_full, b * ndata * hg * wp),
            )
        else:
            n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
                ch, qq, k_, p["n1"], o_i, b * hl * wp, cfg.compute_dtype,
                interpret,
            )
            assert n1 == p["n1"] and merge_pairs == p["merge_pairs"]
            outT = eps_pallas_apply_t_cmt(
                cmt, xT, o_i, k_, n1, bn, interpret, mm_dtype, merge_pairs,
                i == 0,
            )
        xT = outT[None]
        ch, qq, ww = 1, o_i if i == n_eps - 1 else out_full, wp
    o_loc, _, wl, b2 = outT.shape
    v = cfg.pre_linear_image_size
    d = jax.lax.axis_index("space")
    w4 = fast3["linear"]["w3"].reshape(v, wl, o_loc, cfg.num_classes)
    w4 = jnp.pad(w4, ((0, n_space * hl - v), (0, 0), (0, 0), (0, 0)))
    w_loc = jax.lax.dynamic_slice_in_dim(w4, d * hl, hl, axis=0)
    partial_logits = jax.lax.dot_general(
        outT.reshape(o_loc, hl * wl, b2),
        w_loc.reshape(hl * wl, o_loc, cfg.num_classes),
        (((0, 1), (1, 0)), ((), ())),
    )
    return (
        _psum_value_only(partial_logits, ("space", "model"))
        + fast3["linear"]["b"]
    )


def make_sp_tp_fast_train_step(
    cfg: EPSesPlusLinearConfig,
    optimizer: optax.GradientTransformation,
    plans,
    mesh: Mesh,
    reg_type: str = "epswise",
    reg_coeff: float = 0.0,
    frozen_eps_indices: Sequence[int] = (),
    donate: bool = False,
    grad_accum_steps: int = 1,
    qat=None,
    with_probs: bool = False,
):
    """The composed step over the fast (cmt) layout (make_tp_fast_params on
    this mesh): the production Pallas kernel path sharded on all three
    axes. ``qat="int8"`` swaps each shard's forward for the W8A8 STE kernel
    (shard-local quantizers — see _sp_tp_fast_forward_local).
    ``with_probs``: per-sample true-class probabilities gathered over
    ``data`` — the tb-batches hook."""
    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    n_space = mesh.shape["space"]
    n_model = mesh.shape["model"]
    hl = sp_check_config(cfg, n_space)
    frozen = frozenset(frozen_eps_indices)

    def per_shard(fast3, rng, xb, yb):
        def local_loss(f3, xs, ys, r):
            logits = _sp_tp_fast_forward_local(
                f3, xs, cfg, plans, True, r, n_space, hl, n_model, qat=qat,
                ndata=mesh.shape["data"],
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            per_sample = jnp.take_along_axis(logp, ys[:, None], axis=1)[:, 0]
            ce = -jnp.mean(per_sample)
            reg = (
                _tp_fast_local_regularizer(f3, cfg, plans, reg_type, n_model)
                if reg_coeff != 0.0
                else jnp.zeros((), logits.dtype)
            )
            return ce + reg_coeff * reg / n_space, (ce, reg, jnp.exp(per_sample))

        if grad_accum_steps == 1:
            (_, (ce, reg, probs)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(fast3, xb, yb, rng)
        elif with_probs:
            _, ce, reg, grads, probs = grad_accum_scan(
                local_loss, fast3, xb, yb, rng, grad_accum_steps,
                with_probs=True,
            )
        else:
            _, ce, reg, grads = grad_accum_scan(
                local_loss, fast3, xb, yb, rng, grad_accum_steps
            )
        grads = jax.lax.pmean(
            _reduce_grads(grads, frozen, len(fast3["epses_cmt"])), "data"
        )
        metrics = {
            "loss": jax.lax.pmean(ce, "data") + reg_coeff * reg,
            "ce": jax.lax.pmean(ce, "data"),
            "reg_term": reg,
        }
        if with_probs:
            return grads, metrics, probs
        return grads, metrics, jnp.zeros((0,), jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(fast3, opt_state, rng, xb, yb):
        f_specs = _tp_fast_specs(len(fast3["epses_cmt"]))
        grads, metrics, probs = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(f_specs, P(), P(None, "data", "space"), P("data")),
            out_specs=(f_specs, P(), P("data")),
            check_vma=False,
        )(fast3, rng, xb, yb)
        updates, opt_state = optimizer.update(grads, opt_state, fast3)
        fast3 = optax.apply_updates(fast3, updates)
        if with_probs:
            metrics["probs_of_true_class"] = probs
        return fast3, opt_state, metrics

    return step


# ---------------------------------------------------------------------------
# evaluation / inference


def make_sp_tp_forward(
    cfg: EPSesPlusLinearConfig, mesh: Mesh, params3, fast_plans=None,
    qat=None,
):
    """Jitted inference forward: (params3, x_rowsharded) → logits.
    ``qat="int8"`` (fast layout only) runs the quantized forward."""
    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    n_space = mesh.shape["space"]
    n_model = mesh.shape["model"]
    hl = sp_check_config(cfg, n_space)
    p_specs = (
        _tp_fast_specs(len(params3["epses_cmt"]))
        if fast_plans is not None
        else _tp_specs(params3, shard_all=False)
    )

    def local(p3, xb):
        if fast_plans is not None:
            return _sp_tp_fast_forward_local(
                p3, xb, cfg, fast_plans, False, None, n_space, hl, n_model,
                qat=qat, ndata=mesh.shape["data"],
            )
        return _sp_tp_forward_local(
            p3, xb, cfg, False, None, n_space, hl, n_model
        )

    @jax.jit
    def forward(p3, x):
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(p_specs, P(None, "data", "space")),
            out_specs=P("data"),
            check_vma=False,
        )(p3, x)

    return forward


def make_sp_tp_score_fn(
    cfg: EPSesPlusLinearConfig,
    mesh: Mesh,
    batch_size: int,
    params3,
    fast_plans=None,
    qat=None,
):
    """score(params3, x_rowsharded, y) → (mean_ce, accuracy): per-data-shard
    padded-batch scan with the (space, model) logits psum inside, one psum
    over ``data`` at the end. Under ``qat="int8"`` evals score the
    quantized forward."""
    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    from ..train.evaluation import masked_ce_acc_scan, padded_batch_ids

    n_space = mesh.shape["space"]
    n_model = mesh.shape["model"]
    ndata = mesh.shape["data"]
    hl = sp_check_config(cfg, n_space)
    p_specs = (
        _tp_fast_specs(len(params3["epses_cmt"]))
        if fast_plans is not None
        else _tp_specs(params3, shard_all=False)
    )

    @jax.jit
    def score(p3, x, y):
        n = y.shape[0]
        n_local = -(-n // ndata)
        n_pad = n_local * ndata
        if n_pad != n:
            x = jnp.pad(
                x, ((0, 0), (0, n_pad - n)) + ((0, 0),) * (x.ndim - 2)
            )
            y = jnp.pad(y, (0, n_pad - n))

        def per_shard(pp, xx, yy):
            base = jax.lax.axis_index("data") * n_local
            ids, in_range = padded_batch_ids(n_local, batch_size)
            valid = in_range & (base + ids < n)

            def fwd(xb):
                if fast_plans is not None:
                    return _sp_tp_fast_forward_local(
                        pp, xb, cfg, fast_plans, False, None, n_space, hl,
                        n_model, qat=qat, ndata=ndata,
                    )
                return _sp_tp_forward_local(
                    pp, xb, cfg, False, None, n_space, hl, n_model
                )

            ce_sum, correct = masked_ce_acc_scan(fwd, xx, yy, ids, valid)
            return jax.lax.psum(ce_sum, "data"), jax.lax.psum(correct, "data")

        ce_sum, correct = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(p_specs, P(None, "data", "space"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )(p3, x, y)
        return ce_sum / n, correct.astype(jnp.float32) / n

    return score
