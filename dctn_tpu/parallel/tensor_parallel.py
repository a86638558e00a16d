"""Tensor parallelism for EPSesPlusLinear: shard EPS cores' output dims and
the linear head over a ``model`` mesh axis, composable with the ``data``
axis.

SURVEY §2.3 marks TP as the natural extension when Q_out gets large (the
reference has no parallelism at all). Two layouts:

- ``shard_all=False`` (default): only the LAST core is O-sharded. The last
  core is (Q,)*n + (O,), so an O-shard computes its own slice of the
  features and its own rows of the classifier, and ONE psum over the model
  axis reconstructs the logits.
- ``shard_all=True``: EVERY core's output dim is sharded. Each shard
  computes its layer's output slice, and an all_gather over ``model``
  rebuilds the full activation between layers (its transpose is a
  reduce_scatter, expressed as an explicit custom VJP below). This halves
  (per 2-way shard) both the core parameters and the per-layer activation
  compute per chip — the layout for Q_out too large for one chip's VMEM/HBM.

Gradient flow:

- sharded leaves: with the gather VJP in place each shard's gradient of its
  own slice is exact locally — only the batch average (pmean over ``data``)
  is needed;
- replicated leaves (earlier cores in last-only mode, bias): every model
  shard sees only the loss contribution routed through its O-slice, so
  their gradients are psum'd over ``model`` first, then pmean'd over
  ``data``. (The bias enters AFTER the logits psum, so it is full on every
  shard.)

Parameter layout: the classifier weight is kept as (H'·W', O, classes) —
the reference's (in_features, classes) with in_features ordered (h, w, q)
row-major has the q dim FASTEST, so an O-shard of the reference layout would
be strided; the 3-D layout makes the model-axis shard contiguous.
``make_tp_params`` / ``merge_tp_params`` convert to/from the reference
pytree.

Dropout note: parameter-dropout masks are drawn with the single-device key
chain over each core's FULL shape (sharded cores then slice their O-range),
so every shard sees one consistent mask realization and TP training with
dropout is BIT-IDENTICAL to single-device training (tested at p=0.7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.eps_plus_linear import EPSesPlusLinearConfig
from ..ops import composition, eps as eps_mod


def make_tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_model
    return Mesh(
        devices[: n_data * n_model].reshape(n_data, n_model),
        axis_names=("data", "model"),
    )


def _tp_specs(params3, shard_all: bool = False):
    """PartitionSpecs for the TP param layout: w3 + the last core (or every
    core with ``shard_all``) sharded on the output dim."""
    n_eps = len(params3["epses"])
    eps_specs = tuple(
        P(
            *(
                [None] * (params3["epses"][i].ndim - 1)
                + (["model"] if shard_all or i == n_eps - 1 else [None])
            )
        )
        for i in range(n_eps)
    )
    return {
        "epses": eps_specs,
        "linear": {"w3": P(None, "model", None), "b": P()},
    }


def make_tp_params(params, cfg: EPSesPlusLinearConfig, mesh: Mesh, shard_all: bool = False):
    """Reference pytree → TP layout, placed with model-axis shardings."""
    n_model = mesh.shape["model"]
    sharded = params["epses"] if shard_all else params["epses"][-1:]
    for c in sharded:
        assert c.shape[-1] % n_model == 0, (
            f"output dim {c.shape[-1]} not divisible by model axis {n_model}"
        )
    o = params["epses"][-1].shape[-1]
    hw = cfg.pre_linear_image_size ** 2
    w3 = params["linear"]["w"].reshape(hw, o, cfg.num_classes)
    params3 = {
        "epses": tuple(params["epses"]),
        "linear": {"w3": w3, "b": params["linear"]["b"]},
    }
    specs = _tp_specs(params3, shard_all)
    return jax.tree_util.tree_map(
        lambda x, s: _put_tp(x, NamedSharding(mesh, s)),
        params3,
        specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or isinstance(x, np.ndarray),
    )


def _put_tp(x, sharding: NamedSharding):
    """``jax.device_put`` single-process; ``_put_global`` (per-shard
    callback materialization) when the mesh spans processes — every
    controller passes the identical full host value, exactly like the DP
    dataset placement (data_parallel._put_global)."""
    from .data_parallel import _put_global

    return _put_global(np.asarray(x), sharding)


def _to_host(x):
    """Fetch a (possibly multi-process-sharded) param leaf to a full host
    array. Single-process: plain np.asarray. Multi-process: sharded leaves
    are not fully addressable — all-gather them to every process with
    ``multihost_utils.process_allgather`` semantics (a jitted identity with
    replicated out_sharding), then read the local replica."""
    if jax.process_count() == 1 or not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(x.addressable_data(0))
    sharding = x.sharding
    assert isinstance(sharding, NamedSharding), sharding
    gathered = jax.jit(
        lambda a: a, out_shardings=NamedSharding(sharding.mesh, P())
    )(x)
    return np.asarray(gathered.addressable_data(0))


def merge_tp_params(params3, cfg: EPSesPlusLinearConfig):
    """TP layout → reference pytree (gathers shards; multi-process-safe via
    _to_host)."""
    w3 = _to_host(params3["linear"]["w3"])
    return {
        "epses": tuple(_to_host(e) for e in params3["epses"]),
        "linear": {
            "w": w3.reshape(-1, cfg.num_classes),
            "b": _to_host(params3["linear"]["b"]),
        },
    }


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _gather_model(x, axis):
    """all_gather over ``model`` along ``axis`` with its TRUE transpose — a
    tiled reduce_scatter — as an explicit custom VJP. Needed because the TP
    shard_maps run check_vma=False (see _psum_value_only), where autodiff'd
    collective transposes are unreliable; written explicitly, the backward
    sums every shard's cotangent contribution and hands each shard exactly
    its slice, which makes sharded-leaf gradients exact locally."""
    return jax.lax.all_gather(x, "model", axis=axis, tiled=True)


def _gather_model_fwd(x, axis):
    return _gather_model(x, axis), None


def _gather_model_bwd(axis, _, g):
    return (jax.lax.psum_scatter(g, "model", scatter_dimension=axis, tiled=True),)


_gather_model.defvjp(_gather_model_fwd, _gather_model_bwd)


def _psum_value_only(x, axis_name):
    """psum in the VALUE; identity in the TRANSPOSE. Differentiating through
    a real psum inside shard_map needs varying-axis tracking for its
    transpose, and with tracking on the collective transposes scale by the
    axis size (measured). Expressed this way the backward gives exactly the
    per-shard partial derivative, which is what the TP gradient math wants,
    and the shard_map can stay check_vma=False like the DP layer."""
    return x + jax.lax.stop_gradient(jax.lax.psum(x, axis_name) - x)


def _tp_forward_local(
    params3, xb, cfg, training, rng, shard_all=False, n_model=1
):
    """Per-(data, model)-shard forward. Last-only mode: replicated early
    layers, O-sharded last layer. shard_all mode: every layer computes its
    output-dim slice and an all_gather rebuilds the full activation between
    layers. Either way the partial logits are psum'd over the model axis.

    Parameter dropout draws each core's mask with the SAME key chain and
    FULL core shape as the single-device ``_dropout_epses``, then slices a
    sharded core's own O-range — so every shard sees one consistent mask
    realization and TP training at p<1 is bit-identical to single-device
    (an earlier per-shard fold_in drew n_model inconsistent masks for the
    replicated early cores, silently weakening dropout's noise)."""
    epses = params3["epses"]
    n_eps = len(epses)
    if cfg.dropout_p < 1.0 and training:
        m = jax.lax.axis_index("model")
        keys = jax.random.split(rng, n_eps)
        masked = []
        for i, (c, k) in enumerate(zip(epses, keys)):
            sharded = shard_all or i == n_eps - 1
            if sharded and n_model > 1:
                o_loc = c.shape[-1]
                full = c.shape[:-1] + (o_loc * n_model,)
                mask = jax.random.bernoulli(k, cfg.dropout_p, full).astype(c.dtype)
                mask = jax.lax.dynamic_slice_in_dim(
                    mask, m * o_loc, o_loc, axis=c.ndim - 1
                )
            else:
                mask = jax.random.bernoulli(k, cfg.dropout_p, c.shape).astype(c.dtype)
            masked.append(c * mask / cfg.dropout_p)
        epses = tuple(masked)
    backend = cfg.train_backend if training else cfg.eval_backend
    h = xb
    for i, core in enumerate(epses):
        h = eps_mod.eps(
            core, h, compute_dtype=cfg.compute_dtype, backend=backend
        )
        if shard_all and i < len(epses) - 1:
            h = _gather_model(h, h.ndim - 1)  # full Q for the next layer
        h = h[None]
    h = h[0]  # (B, H', W', O_local)
    b_, hp, wp, o_local = h.shape
    flat = h.reshape(b_, hp * wp, o_local)
    partial_logits = jnp.einsum("bpo,poc->bc", flat, params3["linear"]["w3"])
    logits = _psum_value_only(partial_logits, "model") + params3["linear"]["b"]
    return logits


def _local_regularizer(params3, reg_type: str, n_model: int, shard_all: bool):
    """Regularizer expressed so that EVERY term is a per-model-shard partial
    (the caller's gradient reduction psums replicated-leaf grads over the
    model axis): the O-sliced terms decompose naturally; the replicated
    epswise core norms are divided by the axis size so the psum
    reconstructs them exactly once. In shard_all mode every core is an
    O-slice: the epswise norms all decompose, and the composition recursion
    runs on gathered (full) early cores — its intermediate contractions mix
    output indices — while the final contraction still decomposes over the
    last core's local O-slice."""
    epses = params3["epses"]
    w3 = params3["linear"]["w3"]
    if reg_type == "epswise":
        if shard_all:
            partial_reg = jnp.sum(w3**2) + sum(jnp.sum(c**2) for c in epses)
        else:
            partial_reg = (
                jnp.sum(w3**2)
                + eps_mod.inner_product(epses[-1], epses[-1])
                + sum(jnp.sum(c**2) for c in epses[:-1]) / n_model
            )
    else:  # epses_composition: the recursion's final contraction sums over O
        if shard_all:
            epses = tuple(
                _gather_model(c, c.ndim - 1) for c in epses[:-1]
            ) + (epses[-1],)
        partial_reg = jnp.sum(w3**2) + composition.inner_product(epses, epses)
    return _psum_value_only(partial_reg, "model")


def make_tp_train_step(
    cfg: EPSesPlusLinearConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    reg_type: str = "epses_composition",
    reg_coeff: float = 0.0,
    donate: bool = False,
    shard_all: bool = False,
    frozen_eps_indices=(),
    grad_accum_steps: int = 1,
    with_probs: bool = False,
):
    """step(params3, opt_state, rng, xb, yb) → (params3, opt_state, metrics)
    over a ("data", "model") mesh: batch sharded on data, last core + W (or
    every core with ``shard_all``) on model. The optimizer update runs
    OUTSIDE shard_map — GSPMD propagates the parameter shardings into the
    (elementwise) update and the optimizer state, so arbitrary optax state
    pytrees need no manual specs. ``frozen_eps_indices``,
    ``grad_accum_steps`` and ``with_probs`` (per-sample true-class
    probabilities, gathered over the data axis — the tb-batches hook) mirror
    the single-device step (train/step.py)."""
    frozen = frozenset(frozen_eps_indices)

    def per_shard(params3, rng, xb, yb):
        def local_loss(p3, xs, ys, r):
            logits = _tp_forward_local(
                p3, xs, cfg, True, r, shard_all, mesh.shape["model"]
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            per_sample = jnp.take_along_axis(logp, ys[:, None], axis=1)[:, 0]
            ce = -jnp.mean(per_sample)
            reg = (
                _local_regularizer(p3, reg_type, mesh.shape["model"], shard_all)
                if reg_coeff != 0.0
                else jnp.zeros((), logits.dtype)
            )
            return ce + reg_coeff * reg, (ce, reg, jnp.exp(per_sample))

        if grad_accum_steps == 1:
            (loss, (ce, reg, probs)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params3, xb, yb, rng)
        else:
            # the shared microbatching scan (train/step.py); probs come back
            # concatenated in batch order when the tb-batches hook needs them
            from ..train.step import grad_accum_scan

            if with_probs:
                loss, ce, reg, grads, probs = grad_accum_scan(
                    local_loss, params3, xb, yb, rng, grad_accum_steps,
                    with_probs=True,
                )
            else:
                loss, ce, reg, grads = grad_accum_scan(
                    local_loss, params3, xb, yb, rng, grad_accum_steps
                )
        # Sharded leaves' gradients are exact locally (the activation/core
        # gathers carry a true reduce_scatter transpose). In last-only mode
        # the earlier REPLICATED cores feed the last core's LOCAL slice, so
        # each model shard holds only its slice's contribution → psum over
        # model. The bias enters AFTER the logits psum: every shard already
        # has its full gradient (psum'ing it would double-count); same for
        # w3 (its gradient is its own slice) and any sharded core.
        n_eps = len(params3["epses"])
        grads = {
            "epses": tuple(
                jnp.zeros_like(g)
                if i in frozen
                else (
                    g
                    if (shard_all or i == n_eps - 1)
                    else jax.lax.psum(g, "model")
                )
                for i, g in enumerate(grads["epses"])
            ),
            "linear": {"w3": grads["linear"]["w3"], "b": grads["linear"]["b"]},
        }
        grads = jax.lax.pmean(grads, "data")
        metrics = {
            "loss": jax.lax.pmean(loss, "data"),
            "ce": jax.lax.pmean(ce, "data"),
            "reg_term": reg,
        }
        if with_probs:
            return grads, metrics, probs
        return grads, metrics, jnp.zeros((0,), jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params3, opt_state, rng, xb, yb):
        p_specs = _tp_specs(params3, shard_all)
        grads, metrics, probs = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(p_specs, P(), P(None, "data"), P("data")),
            # probs come back data-sharded: concatenating the shards
            # reconstructs the global batch's per-sample values
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
# FAST (cmt) parameter layout under tensor parallelism — last-core sharding.
#
# The cmt matricization stores the last core with OUTPUT-major rows
# ((o, b_rest) row-major), so a model-axis shard of the output dim is a
# CONTIGUOUS block of rows — the fast layout is natively TP-friendly. Early
# cores are replicated cmts, the classifier weight is kept 3-D
# (H'·W', O, classes) so its model shard is contiguous too (same reasoning
# as the reference-layout TP above).


def _tp_fast_specs(n_eps: int):
    return {
        "epses_cmt": tuple(
            P("model", None) if i == n_eps - 1 else P() for i in range(n_eps)
        ),
        "linear": {"w3": P(None, "model", None), "b": P()},
    }


def make_tp_fast_params(fast, cfg: EPSesPlusLinearConfig, mesh: Mesh):
    """Fast (cmt) pytree → TP-fast layout: last cmt row-sharded over
    ``model``, w → w3 (H'·W', O, classes) sharded on O, rest replicated."""
    n_model = mesh.shape["model"]
    o = cfg.epses_specs[-1][1]
    assert o % n_model == 0, (
        f"output dim {o} not divisible by model axis {n_model}"
    )
    hw = cfg.pre_linear_image_size ** 2
    w3 = jnp.asarray(fast["linear"]["w"]).reshape(hw, o, cfg.num_classes)
    fast3 = {
        "epses_cmt": tuple(fast["epses_cmt"]),
        "linear": {"w3": w3, "b": fast["linear"]["b"]},
    }
    specs = _tp_fast_specs(len(fast3["epses_cmt"]))
    return jax.tree_util.tree_map(
        lambda x, s: _put_tp(x, NamedSharding(mesh, s)), fast3, specs,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )


def merge_tp_fast_params(fast3, cfg: EPSesPlusLinearConfig):
    """TP-fast layout → plain fast (cmt) pytree (gathers shards;
    multi-process-safe via _to_host)."""
    w3 = _to_host(fast3["linear"]["w3"])
    return {
        "epses_cmt": tuple(_to_host(c) for c in fast3["epses_cmt"]),
        "linear": {
            "w": w3.reshape(-1, cfg.num_classes),
            "b": _to_host(fast3["linear"]["b"]),
        },
    }


def _tp_fast_forward_local(
    fast3, xb, cfg: EPSesPlusLinearConfig, plans, training, rng, n_model,
    qat=None, ndata=1,
):
    """Per-shard fast-pipeline forward: replicated early cmts run full
    layers; the last layer runs with out_size = O/n_model on its contiguous
    cmt row block; partial logits from the local w3 slice are psum'd over
    ``model``. Dropout draws the reference-order full-shape mask, permutes
    it to cmt, and slices the local rows — one consistent realization, so
    TP-fast training at p<1 stays bit-identical to single-device.

    ``qat="int8"`` runs every layer through the W8A8 STE forward
    (pallas/eps_pallas_q8.apply_q8train_layer): weight quantization is
    per-row, so the last layer's sliced row block quantizes exactly like
    the corresponding rows of the full core — TP-QAT shards reproduce
    single-device QAT numerics."""
    from ..pallas.eps_pallas import (
        _core_to_cmt_k,
        _kernel_dims,
        eps_pallas_apply_t_cmt,
        plan_pallas_call,
    )

    cmts = fast3["epses_cmt"]
    n_eps = len(cmts)
    backend = cfg.train_backend if training else cfg.eval_backend
    assert backend in ("pallas", "pallas_interpret")
    interpret = backend == "pallas_interpret"
    if cfg.dropout_p < 1.0 and training:
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
    c0, b, h, w, q0 = xb.shape
    xT = jnp.transpose(xb, (0, 4, 2, 3, 1))
    ch, qq, hh, ww = c0, q0, h, w
    outT = None
    for i, (cmt, p) in enumerate(zip(cmts, plans)):
        k_, out_full = p["kernel_size"], p["out_size"]
        o_i = out_full // n_model if i == n_eps - 1 else out_full
        hp, wp = hh - k_ + 1, ww - k_ + 1
        if qat == "int8":
            from ..pallas.eps_pallas_q8 import apply_q8train_layer

            # the saved-t STE decision runs on the GLOBAL (out, npix): full
            # O for the sharded last layer, batch unsharded over "data"
            outT = apply_q8train_layer(
                cmt, xT, p, cfg.compute_dtype, interpret, i == 0,
                out_size=o_i,
                save_shapes=(out_full, b * hp * wp * ndata),
            )
        else:
            n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
                ch, qq, k_, p["n1"], o_i, b * hp * wp, cfg.compute_dtype,
                interpret,
            )
            assert n1 == p["n1"] and merge_pairs == p["merge_pairs"]
            outT = eps_pallas_apply_t_cmt(
                cmt, xT, o_i, k_, n1, bn, interpret, mm_dtype, merge_pairs,
                i == 0,
            )
        xT = outT[None]
        ch, qq, hh, ww = 1, out_full, hp, wp
    o_loc, hp2, wp2, b2 = outT.shape
    # same contraction as models._transposed_classifier, w3 already 3-D
    partial_logits = jax.lax.dot_general(
        outT.reshape(o_loc, hp2 * wp2, b2),
        fast3["linear"]["w3"],
        (((0, 1), (1, 0)), ((), ())),
    )
    return _psum_value_only(partial_logits, "model") + fast3["linear"]["b"]


def _tp_fast_local_regularizer(fast3, cfg, plans, reg_type, n_model):
    """Every term a per-shard partial (the step psums replicated-leaf grads
    over ``model``): sharded leaves sum locally, replicated cmt norms are
    divided by the axis size; the composition regularizer gathers the last
    cmt (reduce_scatter transpose), unpermutes to reference cores and
    divides the full inner product by the axis size."""
    cmts = fast3["epses_cmt"]
    w3 = fast3["linear"]["w3"]
    if reg_type == "epswise":
        partial = (
            jnp.sum(w3**2)
            + jnp.sum(cmts[-1] ** 2)
            + sum(jnp.sum(c**2) for c in cmts[:-1]) / n_model
        )
    else:
        from ..models.eps_plus_linear import reference_params_from_fast

        full_last = _gather_model(cmts[-1], 0)
        fast_full = {
            "epses_cmt": tuple(cmts[:-1]) + (full_last,),
            "linear": {"w": w3.reshape(-1, w3.shape[-1]), "b": fast3["linear"]["b"]},
        }
        ref = reference_params_from_fast(fast_full, cfg, plans)
        partial = jnp.sum(w3**2) + composition.inner_product(
            ref["epses"], ref["epses"]
        ) / n_model
    return _psum_value_only(partial, "model")


def make_tp_fast_train_step(
    cfg: EPSesPlusLinearConfig,
    optimizer: optax.GradientTransformation,
    plans,
    mesh: Mesh,
    reg_type: str = "epswise",
    reg_coeff: float = 0.0,
    donate: bool = False,
    frozen_eps_indices=(),
    grad_accum_steps: int = 1,
    with_probs: bool = False,
    qat=None,
):
    """The fast (cmt) layout's TP train step (last-core layout): the
    flagship Pallas pipeline runs per shard with its contiguous cmt row
    block; gradient reduction mirrors make_tp_train_step (replicated early
    cmts psum over ``model``; sharded last cmt / w3 exact locally; bias
    full after the logits psum), then pmean over ``data``; the optimizer
    update runs outside shard_map under GSPMD.

    ``qat="int8"`` swaps each shard's forward for the W8A8 STE kernel
    (per-row weight scales are row-block-local, so the sharded last core
    quantizes exactly like single-device QAT — see
    _tp_fast_forward_local)."""
    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    n_model = mesh.shape["model"]
    n_eps = len(plans)
    frozen = frozenset(frozen_eps_indices)

    def per_shard(fast3, rng, xb, yb):
        def local_loss(f3, xs, ys, r):
            logits = _tp_fast_forward_local(
                f3, xs, cfg, plans, True, r, n_model, qat=qat,
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
            return ce + reg_coeff * reg, (ce, reg, jnp.exp(per_sample))

        if grad_accum_steps == 1:
            (loss, (ce, reg, probs)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(fast3, xb, yb, rng)
        else:
            from ..train.step import grad_accum_scan

            if with_probs:
                # per-microbatch probs concatenate back to batch order —
                # tb-batches composes with gradient accumulation
                loss, ce, reg, grads, probs = grad_accum_scan(
                    local_loss, fast3, xb, yb, rng, grad_accum_steps,
                    with_probs=True,
                )
            else:
                loss, ce, reg, grads = grad_accum_scan(
                    local_loss, fast3, xb, yb, rng, grad_accum_steps
                )
                probs = jnp.zeros((0,), jnp.float32)
        grads = {
            "epses_cmt": tuple(
                jnp.zeros_like(g)
                if i in frozen
                else (g if i == n_eps - 1 else jax.lax.psum(g, "model"))
                for i, g in enumerate(grads["epses_cmt"])
            ),
            "linear": {"w3": grads["linear"]["w3"], "b": grads["linear"]["b"]},
        }
        grads = jax.lax.pmean(grads, "data")
        metrics = {
            "loss": jax.lax.pmean(loss, "data"),
            "ce": jax.lax.pmean(ce, "data"),
            "reg_term": reg,
        }
        return grads, metrics, probs

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(fast3, opt_state, rng, xb, yb):
        p_specs = _tp_fast_specs(n_eps)
        grads, metrics, probs = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(p_specs, P(), P(None, "data"), P("data")),
            out_specs=(p_specs, P(), P("data")),
            check_vma=False,
        )(fast3, rng, xb, yb)
        updates, opt_state = optimizer.update(grads, opt_state, fast3)
        fast3 = optax.apply_updates(fast3, updates)
        if with_probs:
            metrics["probs_of_true_class"] = probs
        return fast3, opt_state, metrics

    return step


def make_tp_fast_score_fn(
    cfg: EPSesPlusLinearConfig, plans, mesh: Mesh, batch_size: int, qat=None
):
    """score(fast3, x, y) → (mean_ce, accuracy) over the TP-fast layout —
    data-sharded scan with the per-batch logits psum over ``model`` as the
    only inner collective (mirrors make_tp_score_fn). Under ``qat="int8"``
    evals score the quantized forward, so early stopping tracks the
    int8-deployment accuracy."""
    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    n_model = mesh.shape["model"]
    p_specs = _tp_fast_specs(len(plans))
    ndata = mesh.shape["data"]

    @jax.jit
    def score(fast3, x, y):
        n = y.shape[0]
        n_local = -(-n // ndata)
        n_pad = n_local * ndata
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n)) + ((0, 0),) * (x.ndim - 2))
            y = jnp.pad(y, (0, n_pad - n))

        def per_shard(f3, xx, yy):
            from ..train.evaluation import masked_ce_acc_scan, padded_batch_ids

            base = jax.lax.axis_index("data") * n_local
            ids, in_range = padded_batch_ids(n_local, batch_size)
            valid = in_range & (base + ids < n)
            ce_sum, correct = masked_ce_acc_scan(
                lambda xb: _tp_fast_forward_local(
                    f3, xb, cfg, plans, False, None, n_model, qat=qat,
                    ndata=ndata,
                ),
                xx, yy, ids, valid,
            )
            return jax.lax.psum(ce_sum, "data"), jax.lax.psum(correct, "data")

        ce_sum, correct = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(p_specs, P(None, "data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )(fast3, x, y)
        return ce_sum / n, correct.astype(jnp.float32) / n

    return score


def make_tp_score_fn(
    cfg: EPSesPlusLinearConfig,
    mesh: Mesh,
    batch_size: int,
    params3_example,
    shard_all: bool = False,
):
    """score(params3, x, y) → (mean_ce, accuracy): the TP analog of
    train.evaluation.make_score_fn — the split is sharded along samples over
    the ``data`` axis (like the DP path's sharded eval, so TP×DP eval scales
    with the data mesh instead of replicating the whole split per chip); each
    data row scans ITS chunk in padded fixed-size batches inside the
    shard_map (the per-batch logits psum over ``model`` is the only inner
    collective), then one psum over ``data`` reduces the two scalars."""
    p_specs = _tp_specs(params3_example, shard_all)
    ndata = mesh.shape["data"]

    @jax.jit
    def score(params3, x, y):
        n = y.shape[0]
        n_local = -(-n // ndata)  # samples per data row
        n_pad = n_local * ndata
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n)) + ((0, 0),) * (x.ndim - 2))
            y = jnp.pad(y, (0, n_pad - n))
        def per_shard(p3, xx, yy):
            from ..train.evaluation import masked_ce_acc_scan, padded_batch_ids

            base = jax.lax.axis_index("data") * n_local
            ids, in_range = padded_batch_ids(n_local, batch_size)
            valid = in_range & (base + ids < n)
            ce_sum, correct = masked_ce_acc_scan(
                lambda xb: _tp_forward_local(
                    p3, xb, cfg, False, None, shard_all, mesh.shape["model"]
                ),
                xx, yy, ids, valid,
            )
            return (
                jax.lax.psum(ce_sum, "data"),
                jax.lax.psum(correct, "data"),
            )

        ce_sum, correct = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(p_specs, P(None, "data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )(params3, x, y)
        return ce_sum / n, correct.astype(jnp.float32) / n

    return score


def make_tp_forward(
    cfg: EPSesPlusLinearConfig, mesh: Mesh, params3_example, shard_all: bool = False
):
    """Jitted TP inference forward: (params3, x) → logits."""
    p_specs = _tp_specs(params3_example, shard_all)

    @jax.jit
    def forward(params3, x):
        return jax.shard_map(
            lambda p3, xb: _tp_forward_local(
                p3, xb, cfg, False, None, shard_all, mesh.shape["model"]
            ),
            mesh=mesh,
            in_specs=(p_specs, P(None, "data")),
            out_specs=P("data"),
            check_vma=False,
        )(params3, x)

    return forward
