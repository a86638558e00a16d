"""Spatial parallelism (SP) for EPSesPlusLinear: shard the image HEIGHT over
a ``space`` mesh axis with halo exchange between EPS layers, composable with
the ``data`` axis.

Why this axis exists (beyond-reference capability; the reference —
dctn/eps_plus_linear.py + dctn/training.py — is strictly single-device): an
EPS layer explodes each K×K window into a Q^(K²C)-dim Khatri-Rao vector, so
activation memory scales like B·H·W·Q^n1 and one chip tops out quickly as the
image grows. DP shards B, TP shards the output dim O; SP shards H so the
SAME model runs images whose activations exceed one chip's HBM — the mesh
dimension you add for high-resolution inputs.

Design (TPU-first, ICI-friendly):

- The input (C, B, H, W, Q) is zero-padded at the BOTTOM to H_pad = P·Hl and
  row-sharded: device d owns rows [d·Hl, (d+1)·Hl). Every EPS layer keeps
  exactly Hl rows per device: before the layer, each device pulls the first
  K-1 rows of its SUCCESSOR's block (one ``jax.lax.ppermute`` per layer — a
  nearest-neighbor ICI transfer of a (C,B,K-1,W,Q) slab, the cheapest
  collective topology a torus has), concatenates them below its own rows,
  and applies the stock ``ops.eps`` (or the fused Pallas cmt kernel) to the
  (Hl+K-1)-row slab → Hl output rows. The LAST device receives zeros
  (ppermute with no source), which is exactly the bottom padding semantics.
- Validity is positional, never masked in-flight: after layer i the globally
  valid rows are V_i = H − Σ_{j≤i}(K_j−1). An output row r is valid iff its
  window touches only valid rows, i.e. iff r < V_{i+1} — so garbage rows
  (all at the global bottom, all finite: zeros in → polynomial → finite) can
  never leak into a valid row, forward or backward.
- The classifier masks by CONSTRUCTION: the reference weight (rows ordered
  (h, w, o) row-major, eps_plus_linear.py:120-133 layout) is zero-padded
  along h to P·Hl rows and each device dynamic-slices its own h-range, so
  invalid feature rows multiply zero weights (zero logits contribution, zero
  cotangent back into garbage rows). Partial logits are psum'd over
  ``space`` — the only non-neighbor collective in the forward.

Gradient flow (same discipline as tensor_parallel.py — grads are taken
INSIDE shard_map with check_vma=False, so every cross-device edge carries an
explicit custom-VJP transpose):

- the halo pull's transpose pushes the received-rows cotangent back to the
  sender (the inverse ppermute) — ``_halo_pull``;
- the logits psum is value-only (identity transpose) — each device keeps its
  own partial derivative;
- per-leaf reduction: EPS cores see only the windows their device owns and
  the classifier weight's device slices are disjoint → both psum over
  ``space``; the bias enters AFTER the logits psum (full gradient on every
  device — psum would multiply it by P). The regularizer (a function of the
  replicated params) is divided by P in the local loss so the psum
  reconstructs its gradient exactly once.

Constraint: K−1 ≤ Hl for every layer (halos are single-hop). Width stays
local — H-sharding alone covers the memory scaling (W would shard the same
way by symmetry).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.eps_plus_linear import (
    EPSesPlusLinearConfig,
    _dropout_epses,
)
from ..ops import eps as eps_mod
from ..train.step import REGULARIZERS, grad_accum_scan, make_fast_reg_fn
from .data_parallel import _put_global
from .tensor_parallel import _psum_value_only


def make_sp_mesh(n_data: int, n_space: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_space
    return Mesh(
        devices[: n_data * n_space].reshape(n_data, n_space),
        axis_names=("data", "space"),
    )


def sp_local_rows(image_size: int, n_space: int) -> int:
    """Rows per device: Hl = ⌈H/P⌉ (the input is bottom-padded to P·Hl)."""
    return -(-image_size // n_space)


def sp_check_config(cfg: EPSesPlusLinearConfig, n_space: int) -> int:
    """Validate the single-hop halo constraint; returns Hl."""
    hl = sp_local_rows(cfg.image_size, n_space)
    for k, _ in cfg.epses_specs:
        if k - 1 > hl:
            raise ValueError(
                f"spatial axis {n_space} too large: kernel {k} needs a "
                f"{k - 1}-row halo but each device holds only {hl} rows"
            )
    return hl


def pad_rows(x, n_space: int, row_axis: int = 2):
    """Zero-pad the height axis to a multiple of the space axis size."""
    h = x.shape[row_axis]
    pad = (-h) % n_space
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[row_axis] = (0, pad)
    return (jnp if isinstance(x, jax.Array) else np).pad(x, widths)


def sp_shard_batch(mesh: Mesh, x, y=None):
    """Place a batch (C, B, H, W, Q) row-sharded over ``space`` (and batch-
    sharded over ``data``), padding H. ``y`` (B,) goes data-sharded."""
    n_space = mesh.shape["space"]
    xp = pad_rows(np.asarray(x), n_space)
    xs = _put_global(xp, NamedSharding(mesh, P(None, "data", "space")))
    if y is None:
        return xs
    ys = _put_global(np.asarray(y), NamedSharding(mesh, P("data")))
    return xs, ys


# ---------------------------------------------------------------------------
# the halo collective


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _halo_pull(head, n_space):
    """Every device sends its FIRST rows to its predecessor; device d
    receives device d+1's head (the rows just below its block). The last
    device receives zeros — identical to the global bottom zero-padding.
    Transpose: the received cotangent is pushed BACK to the successor that
    owns those rows (the inverse ppermute; device 0's incoming cotangent is
    dropped — nobody sent to it). Explicit because the SP shard_maps run
    check_vma=False (see tensor_parallel._psum_value_only)."""
    perm = [(d, d - 1) for d in range(1, n_space)]
    return jax.lax.ppermute(head, "space", perm)


def _halo_pull_fwd(head, n_space):
    return _halo_pull(head, n_space), None


def _halo_pull_bwd(n_space, _, g):
    perm = [(d, d + 1) for d in range(n_space - 1)]
    return (jax.lax.ppermute(g, "space", perm),)


_halo_pull.defvjp(_halo_pull_fwd, _halo_pull_bwd)


def _with_halo(x, kernel_size: int, n_space: int, row_axis: int):
    """Concatenate the successor's first K-1 rows below this device's block."""
    if kernel_size == 1:
        return x
    idx = [slice(None)] * x.ndim
    idx[row_axis] = slice(0, kernel_size - 1)
    halo = _halo_pull(x[tuple(idx)], n_space)
    return jnp.concatenate([x, halo], axis=row_axis)


# ---------------------------------------------------------------------------
# reference-layout forward


def _sp_classifier(feats, linear, cfg: EPSesPlusLinearConfig, hl: int,
                   n_space: int):
    """feats: (B, Hl, W', O) — this device's rows. The reference weight
    (V·W'·O rows, (h, w, o) row-major) is zero-padded along h to P·Hl rows;
    each device contracts its own h-slice, partial logits psum over space."""
    b, _, wl, o = feats.shape
    v = cfg.pre_linear_image_size
    d = jax.lax.axis_index("space")
    w4 = linear["w"].reshape(v, wl * o, cfg.num_classes)
    w4 = jnp.pad(w4, ((0, n_space * hl - v), (0, 0), (0, 0)))
    w_loc = jax.lax.dynamic_slice_in_dim(w4, d * hl, hl, axis=0)
    partial_logits = jax.lax.dot_general(
        feats.reshape(b, hl * wl * o),
        w_loc.reshape(hl * wl * o, cfg.num_classes),
        (((1,), (0,)), ((), ())),
    )
    return _psum_value_only(partial_logits, "space") + linear["b"]


def _sp_forward_local(
    params,
    xb,
    cfg: EPSesPlusLinearConfig,
    training: bool,
    rng,
    n_space: int,
    hl: int,
):
    """Per-device SP forward: xb (C, B, Hl, W, Q) → full logits (B, classes).
    Dropout draws the single-device key chain over full core shapes with the
    REPLICATED rng — every device sees the identical mask realization, so SP
    training at p<1 is bit-identical to single-device."""
    epses = params["epses"]
    if cfg.dropout_p < 1.0 and training:
        epses = _dropout_epses(epses, cfg.dropout_p, rng)
    backend = cfg.train_backend if training else cfg.eval_backend
    h = xb
    for core in epses:
        c = h.shape[0]
        k = eps_mod._infer_kernel_size(core, c)
        h_ext = _with_halo(h, k, n_space, row_axis=2)
        h = eps_mod.eps(
            core, h_ext, compute_dtype=cfg.compute_dtype, backend=backend
        )[None]
    return _sp_classifier(h[0], params["linear"], cfg, hl, n_space)


# ---------------------------------------------------------------------------
# training step (reference layout)


def make_sp_train_step(
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
    """step(params, opt_state, rng, xb, yb) → (params, opt_state, metrics)
    over a ("data", "space") mesh: xb (C, B, P·Hl, W, Q) sharded
    P(None, "data", "space"), yb (B,) sharded P("data"), params/opt_state
    replicated. Trajectory-exact vs single-device training on the same
    global batch (tests/test_spatial_parallel.py). ``with_probs``: the
    per-sample true-class probabilities (logits are FULL on every shard
    after the space psum, so each data shard's slice is exact) come back
    gathered over ``data`` — the tb-batches hook."""
    n_space = mesh.shape["space"]
    hl = sp_check_config(cfg, n_space)
    frozen = frozenset(frozen_eps_indices)
    reg_fn = REGULARIZERS[reg_type]

    def per_shard(params, rng, xb, yb):
        def local_loss(p, xs, ys, r):
            logits = _sp_forward_local(p, xs, cfg, True, r, n_space, hl)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per_sample = jnp.take_along_axis(logp, ys[:, None], axis=1)[:, 0]
            ce = -jnp.mean(per_sample)
            # full reg divided by the axis size: the space-psum of the leaf
            # gradients then reconstructs the reg gradient exactly once
            reg = (
                reg_fn(p) / n_space
                if reg_coeff != 0.0
                else jnp.zeros((), logits.dtype)
            )
            return ce + reg_coeff * reg, (ce, reg, jnp.exp(per_sample))

        if grad_accum_steps == 1:
            (_, (ce, reg, probs)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, xb, yb, rng)
        elif with_probs:
            _, ce, reg, grads, probs = grad_accum_scan(
                local_loss, params, xb, yb, rng, grad_accum_steps,
                with_probs=True,
            )
        else:
            _, ce, reg, grads = grad_accum_scan(
                local_loss, params, xb, yb, rng, grad_accum_steps
            )
        grads = {
            "epses": tuple(
                jnp.zeros_like(g) if i in frozen else jax.lax.psum(g, "space")
                for i, g in enumerate(grads["epses"])
            ),
            # w: device h-slices are disjoint (+ reg/P replicated) → psum is
            # the exact total; b enters after the logits psum → already full
            "linear": {
                "w": jax.lax.psum(grads["linear"]["w"], "space"),
                "b": grads["linear"]["b"],
            },
        }
        grads = jax.lax.pmean(grads, "data")
        reg_full = reg * n_space
        metrics = {
            "loss": jax.lax.pmean(ce, "data") + reg_coeff * reg_full,
            "ce": jax.lax.pmean(ce, "data"),
            "reg_term": reg_full,
        }
        if with_probs:
            return grads, metrics, probs
        return grads, metrics, jnp.zeros((0,), jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, rng, xb, yb):
        grads, metrics, probs = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(), P(None, "data", "space"), P("data")),
            out_specs=(P(), P(), P("data")),
            check_vma=False,
        )(params, rng, xb, yb)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if with_probs:
            metrics["probs_of_true_class"] = probs
        return params, opt_state, metrics

    return step


# ---------------------------------------------------------------------------
# FAST (cmt) layout under SP: the flagship Pallas pipeline runs per row-shard
# in its transposed batch-minor layout; the halo exchange happens directly on
# the transposed activations (rows are a MIDDLE dim of (C, Q, Hl, W, B) /
# (O, Hl, W', B), so the slab slice/concat never touches the lane dim).


def _sp_fast_forward_local(
    fast,
    xb,
    cfg: EPSesPlusLinearConfig,
    plans,
    training: bool,
    rng,
    n_space: int,
    hl: int,
    qat=None,
    ndata=1,
):
    """``qat="int8"``: each row shard runs the W8A8 STE forward
    (pallas/eps_pallas_q8.apply_q8train_layer). Activation quantization is
    per-pixel-COLUMN and this shard's pixel columns (its h-range plus the
    halo rows) carry the same values as single-device QAT, so SP-QAT is
    numerically identical to the single-device quantized forward on every
    valid pixel; garbage bottom rows quantize shard-locally and stay masked
    by the zero-padded classifier rows exactly as in f32 SP. The saved-t
    STE decision runs on the GLOBAL shapes (full valid H'·W', batch ×
    ``ndata``) via ``qat_save_decision`` so all shards and the
    single-device run agree on the backward variant."""
    from ..models.eps_plus_linear import _dropout_cmts
    from ..pallas.eps_pallas import eps_pallas_apply_t_cmt, plan_pallas_call

    cmts = fast["epses_cmt"]
    if cfg.dropout_p < 1.0 and training:
        cmts = _dropout_cmts(cmts, plans, cfg.dropout_p, rng)
    backend = cfg.train_backend if training else cfg.eval_backend
    assert backend in ("pallas", "pallas_interpret"), (
        "fast params run only on the Pallas pipeline"
    )
    interpret = backend == "pallas_interpret"
    c0, b, _, w, q0 = xb.shape
    xT = jnp.transpose(xb, (0, 4, 2, 3, 1))  # (C, Q, Hl, W, B)
    ch, qq, ww = c0, q0, w
    hg = cfg.image_size  # unsharded valid height, for the QAT save decision
    outT = None
    for i, (cmt, p) in enumerate(zip(cmts, plans)):
        k_, out_size = p["kernel_size"], p["out_size"]
        xT = _with_halo(xT, k_, n_space, row_axis=2)
        wp = ww - k_ + 1
        hg -= k_ - 1
        if qat == "int8":
            from ..pallas.eps_pallas_q8 import apply_q8train_layer

            outT = apply_q8train_layer(
                cmt, xT, p, cfg.compute_dtype, interpret, i == 0,
                save_shapes=(out_size, b * ndata * hg * wp),
            )
        else:
            n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
                ch, qq, k_, p["n1"], out_size, b * hl * wp,
                cfg.compute_dtype, interpret,
            )
            assert n1 == p["n1"] and merge_pairs == p["merge_pairs"]
            outT = eps_pallas_apply_t_cmt(
                cmt, xT, out_size, k_, n1, bn, interpret, mm_dtype,
                merge_pairs, i == 0,
            )
        xT = outT[None]
        ch, qq, ww = 1, out_size, wp
    # transposed classifier over this device's h-slice of the weight
    o, _, wl, b2 = outT.shape
    v = cfg.pre_linear_image_size
    d = jax.lax.axis_index("space")
    w4 = fast["linear"]["w"].reshape(v, wl, o, cfg.num_classes)
    w4 = jnp.pad(w4, ((0, n_space * hl - v), (0, 0), (0, 0), (0, 0)))
    w_loc = jax.lax.dynamic_slice_in_dim(w4, d * hl, hl, axis=0)
    partial_logits = jax.lax.dot_general(
        outT.reshape(o, hl * wl, b2),
        w_loc.reshape(hl * wl, o, cfg.num_classes),
        (((0, 1), (1, 0)), ((), ())),
    )
    return _psum_value_only(partial_logits, "space") + fast["linear"]["b"]


def make_sp_fast_train_step(
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
    """The SP train step over the fast (cmt) parameter layout — the flagship
    kernel path row-sharded over ``space`` (and batch-sharded over ``data``).
    Gradient reduction mirrors make_sp_train_step: cmt cores + w psum over
    space, bias full, then pmean over data; optimizer outside under GSPMD.
    ``qat="int8"`` swaps each shard's forward for the W8A8 STE kernel
    (shard-local quantizers — see _sp_fast_forward_local). ``with_probs``:
    per-sample true-class probabilities gathered over ``data`` (the
    tb-batches hook; logits are full per shard after the space psum)."""
    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    n_space = mesh.shape["space"]
    hl = sp_check_config(cfg, n_space)
    frozen = frozenset(frozen_eps_indices)
    reg_fn = make_fast_reg_fn(cfg, plans, reg_type)

    def per_shard(fast, rng, xb, yb):
        def local_loss(f, xs, ys, r):
            logits = _sp_fast_forward_local(
                f, xs, cfg, plans, True, r, n_space, hl, qat=qat,
                ndata=mesh.shape["data"],
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            per_sample = jnp.take_along_axis(logp, ys[:, None], axis=1)[:, 0]
            ce = -jnp.mean(per_sample)
            reg = (
                reg_fn(f) / n_space
                if reg_coeff != 0.0
                else jnp.zeros((), logits.dtype)
            )
            return ce + reg_coeff * reg, (ce, reg, jnp.exp(per_sample))

        if grad_accum_steps == 1:
            (_, (ce, reg, probs)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(fast, xb, yb, rng)
        elif with_probs:
            _, ce, reg, grads, probs = grad_accum_scan(
                local_loss, fast, xb, yb, rng, grad_accum_steps,
                with_probs=True,
            )
        else:
            _, ce, reg, grads = grad_accum_scan(
                local_loss, fast, xb, yb, rng, grad_accum_steps
            )
        grads = {
            "epses_cmt": tuple(
                jnp.zeros_like(g) if i in frozen else jax.lax.psum(g, "space")
                for i, g in enumerate(grads["epses_cmt"])
            ),
            "linear": {
                "w": jax.lax.psum(grads["linear"]["w"], "space"),
                "b": grads["linear"]["b"],
            },
        }
        grads = jax.lax.pmean(grads, "data")
        reg_full = reg * n_space
        metrics = {
            "loss": jax.lax.pmean(ce, "data") + reg_coeff * reg_full,
            "ce": jax.lax.pmean(ce, "data"),
            "reg_term": reg_full,
        }
        if with_probs:
            return grads, metrics, probs
        return grads, metrics, jnp.zeros((0,), jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(fast, opt_state, rng, xb, yb):
        grads, metrics, probs = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(), P(None, "data", "space"), P("data")),
            out_specs=(P(), P(), P("data")),
            check_vma=False,
        )(fast, rng, xb, yb)
        updates, opt_state = optimizer.update(grads, opt_state, fast)
        fast = optax.apply_updates(fast, updates)
        if with_probs:
            metrics["probs_of_true_class"] = probs
        return fast, opt_state, metrics

    return step


# ---------------------------------------------------------------------------
# evaluation / inference


def make_sp_forward(
    cfg: EPSesPlusLinearConfig, mesh: Mesh, fast_plans=None, qat=None
):
    """Jitted SP inference forward: (params, x_rowsharded) → logits. Pass
    ``fast_plans`` to run the fast (cmt) layout instead of the reference
    one; ``qat="int8"`` (fast layout only) runs the quantized forward."""
    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    n_space = mesh.shape["space"]
    hl = sp_check_config(cfg, n_space)

    def local(params, xb):
        if fast_plans is not None:
            return _sp_fast_forward_local(
                params, xb, cfg, fast_plans, False, None, n_space, hl,
                qat=qat, ndata=mesh.shape["data"],
            )
        return _sp_forward_local(params, xb, cfg, False, None, n_space, hl)

    @jax.jit
    def forward(params, x):
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(None, "data", "space")),
            out_specs=P("data"),
            check_vma=False,
        )(params, x)

    return forward


def make_sp_score_fn(
    cfg: EPSesPlusLinearConfig, mesh: Mesh, batch_size: int, fast_plans=None,
    qat=None,
):
    """score(params, x_rowsharded, y) → (mean_ce, accuracy): per-data-shard
    padded-batch scan with the per-batch logits psum over ``space`` inside,
    one psum over ``data`` at the end (mirrors make_tp_score_fn). Under
    ``qat="int8"`` evals score the quantized forward."""
    if qat not in (None, "int8"):
        raise ValueError(f"unsupported qat mode {qat!r}")
    from ..train.evaluation import masked_ce_acc_scan, padded_batch_ids

    n_space = mesh.shape["space"]
    ndata = mesh.shape["data"]
    hl = sp_check_config(cfg, n_space)

    @jax.jit
    def score(params, x, y):
        n = y.shape[0]
        n_local = -(-n // ndata)
        n_pad = n_local * ndata
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n)) + ((0, 0),) * (x.ndim - 2))
            y = jnp.pad(y, (0, n_pad - n))

        def per_shard(p, xx, yy):
            base = jax.lax.axis_index("data") * n_local
            ids, in_range = padded_batch_ids(n_local, batch_size)
            valid = in_range & (base + ids < n)

            def fwd(xb):
                if fast_plans is not None:
                    return _sp_fast_forward_local(
                        p, xb, cfg, fast_plans, False, None, n_space, hl,
                        qat=qat, ndata=ndata,
                    )
                return _sp_forward_local(p, xb, cfg, False, None, n_space, hl)

            ce_sum, correct = masked_ce_acc_scan(fwd, xx, yy, ids, valid)
            return jax.lax.psum(ce_sum, "data"), jax.lax.psum(correct, "data")

        ce_sum, correct = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(None, "data", "space"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, x, y)
        return ce_sum / n, correct.astype(jnp.float32) / n

    return score
