"""int8 (W8A8) fused Pallas forward for EPS serving.

TPU-native capability with no reference analog (the reference's deployment
story ends at training scripts — see ``cli/export.py``): the v5e MXU runs
int8×int8→int32 at ~2× its bf16 rate (measured on this chip: 305 vs
165 T(FL)OPS at (8192,4096)×(4096,4096)), so the serving forward — whose
FLOPs live almost entirely in each layer's (Z, A)×(A, bn) matmul — can
roughly halve its MXU time by quantizing that matmul.

Scheme (standard dynamic W8A8, no calibration data needed):
- **Weights** (the matricized core, static at export time): symmetric
  per-row int8 — ``sw[z] = max|cmt[z, :]| / 127``, ``wq = round(cmt / sw)``.
  Per-row scales are exact w.r.t. the matmul (each output row is scaled by
  one constant).
- **Activations** (the Khatri-Rao chain product ``u``, built in-kernel):
  symmetric per-COLUMN (per-pixel) int8, computed dynamically on the VPU —
  ``su[b] = max_a |u[a, b]| / 127``. Per-column scales are likewise exact
  w.r.t. the matmul.
- ``t = (wq @ uq).int32 → f32 · sw · su`` — the only approximation is the
  rounding of the two int8 quantizations; the int32 accumulation itself is
  exact (A ≤ 4096 entries of |v| ≤ 127² keeps the sum far below 2³¹).
- The second contraction (t against the other half's chain product ``v``)
  stays f32 on the VPU — it is elementwise work, not MXU work.

Forward-only by design: training keeps full precision (the f32/bf16 custom
VJP kernels in ``eps_pallas.py``); this path exists for the deployment
artifacts (``cli/export.py --quantize int8``), where it also shrinks the
baked-in weights 4×.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .eps_pallas import (
    _VMEM_BUDGET_BYTES,
    _ab,
    _compiler_kwargs,
    _core_to_cmt_k,
    _kernel_dims,
    _largest_bn,
    _stack_views_from_xT,
    _suffix_chain,
)

_EPS_SCALE = 1e-30  # guard: all-zero rows/columns quantize to 0 with a tiny
# positive scale instead of dividing by zero (padded pixel columns are zero)


def quantize_cmt(cmt):
    """Per-row symmetric int8 quantization of a matricized (Z, A) core:
    (wq int8 (Z, A), sw f32 (Z, 1)). Pure jnp — the in-kernel activation
    quantizer uses the same round/clip ops, so CPU oracles can replicate the
    math bit-for-bit."""
    cmt = jnp.asarray(cmt, jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(cmt), axis=1, keepdims=True) / 127.0,
                     _EPS_SCALE)
    wq = jnp.clip(jnp.round(cmt / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def _quantize_columns(u):
    """Dynamic per-column int8 of the (A, bn) chain product (VPU ops only):
    (uq int8, su f32 (1, bn))."""
    su = jnp.maximum(jnp.max(jnp.abs(u), axis=0, keepdims=True) / 127.0,
                     _EPS_SCALE)
    uq = jnp.clip(jnp.round(u / su), -127, 127).astype(jnp.int8)
    return uq, su


def _fwd_q8_bytes(n, n1, q, o, bn):
    """VMEM estimate for the int8 forward at tile size bn: the resident int8
    core + its f32 row scales, plus per-tile views / chain products (f32),
    the int8 u tile, the int32 t tile and the f32 dequantized t."""
    a, z = _ab(n, n1, q, o)
    return (
        a * z  # int8 resident core
        + 4 * z  # sw (padded to a lane, counted generously by caller budget)
        + a * bn  # int8 uq
        + 4 * bn * (2 * a + 3 * z + n * q + o)
    )


def plan_q8_bn(n, n1, q, o, npix_cap):
    """Largest bn tile for the int8 forward under the shared VMEM budget
    (same candidate ladder as the f32 planner); None if even bn=128
    overflows (then the layer cannot run the q8 kernel)."""
    return _largest_bn(
        lambda bn: _fwd_q8_bytes(n, n1, q, o, bn), cap=npix_cap
    )


def _fwd_q8_kernel_factory(
    n: int, n1: int, q: int, o: int, bn: int, save_t=False, t_dtype=None
):
    n2 = n - n1

    def kernel(views_ref, wq_ref, sw_ref, out_ref, *t_refs):
        # views_ref: (n, q, bn) f32; wq_ref: (Z, A) int8 o-major rows;
        # sw_ref: (Z, 1) f32; out_ref: (o, bn) f32; t_refs: ((Z, bn)
        # storage-dtype,) when save_t — the DEQUANTIZED t persisted for the
        # QAT saved-t backward (so activation cotangents flow through the
        # values the quantized forward actually produced).
        u = _suffix_chain(views_ref, 0, n1)[0]  # (A, bn) f32
        uq, su = _quantize_columns(u)
        t_i32 = jax.lax.dot_general(
            wq_ref[:], uq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        t = t_i32.astype(jnp.float32) * sw_ref[:] * su  # (Z, bn)
        if save_t:
            t_refs[0][:] = t.astype(t_refs[0].dtype)
        if n2 > 0:
            v = _suffix_chain(views_ref, n1, n)[0]  # (q^n2, bn)
            t3 = t.reshape(o, q**n2, bn)
            rows = [
                jnp.sum(t3[oi] * v, axis=0, keepdims=True) for oi in range(o)
            ]
            out = jnp.concatenate(rows, axis=0)
        else:
            out = t
        out_ref[:] = out

    return kernel


@partial(
    jax.jit,
    static_argnames=("n1", "out_size", "bn", "interpret", "save_t", "t_dtype"),
)
def _run_fwd_q8(
    views_t, wq, sw, n1, out_size, bn, interpret, save_t=False, t_dtype=None
):
    n, q, npad = views_t.shape
    z = wq.shape[0]
    out_shape = jax.ShapeDtypeStruct((out_size, npad), jnp.float32)
    out_spec = pl.BlockSpec(
        (out_size, bn), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    if save_t:
        out_shape = (out_shape, jax.ShapeDtypeStruct((z, npad), t_dtype))
        out_spec = (
            out_spec,
            pl.BlockSpec((z, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        )
    return pl.pallas_call(
        _fwd_q8_kernel_factory(n, n1, q, out_size, bn, save_t, t_dtype),
        out_shape=out_shape,
        grid=(npad // bn,),
        in_specs=[
            pl.BlockSpec((n, q, bn), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wq.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sw.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(views_t, wq, sw)


def eps_pallas_apply_t_q8(
    wq, sw, xT, out_size, kernel_size, n1, bn, interpret, merge_pairs
):
    """Quantized transposed-pipeline EPS forward: xT (C, Q, H, W, B) →
    outT (O, H', W', B). ``wq``/``sw`` from ``quantize_cmt`` of the layer's
    (Z, A) matricized core under the SAME (n1, merge_pairs) plan used to
    stack the views. Inference-only (no VJP)."""
    c, q, h, w, b = xT.shape
    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    _n_k, _q_k, n1_k = _kernel_dims(c, q, kernel_size, n1, merge_pairs)
    views_t, npix = _stack_views_from_xT(xT, kernel_size, bn, merge_pairs)
    out_t = _run_fwd_q8(views_t, wq, sw, n1_k, out_size, bn, interpret)
    return out_t[:, :npix].reshape(out_size, hp, wp, b)


def quantize_fast_params(fast, plans):
    """Fast (cmt) parameter pytree → int8 serving pytree:
    ``{"epses_q": (int8 (Z,A), …), "epses_scale": (f32 (Z,1), …),
    "linear": f32}``. The classifier stays f32 — its matmul is a rounding
    error of the total FLOPs. Exactly inverts nothing: quantization is
    lossy; use only for serving."""
    wqs, sws = [], []
    for cmt in fast["epses_cmt"]:
        wq, sw = quantize_cmt(cmt)
        wqs.append(wq)
        sws.append(sw)
    return {
        "epses_q": tuple(wqs),
        "epses_scale": tuple(sws),
        "linear": dict(fast["linear"]),
    }


def quantize_reference_params(params, cfg, plans=None, in_channels=1):
    """Reference-layout params → (qparams, plans) via the fast cmt
    matricization (the q8 kernel consumes cmt-layout rows)."""
    from ..models.eps_plus_linear import fast_params_from_reference

    fast, plans = fast_params_from_reference(params, cfg, plans)
    return quantize_fast_params(fast, plans), plans


# ---------------------------------------------------------------------------
# QAT: the int8 forward used for TRAINING, with straight-through gradients


def _fwd_q8t_bytes(n, n1, q, o, bn, t_bytes):
    """Q8 forward + a double-buffered (Z, bn) saved-t output block."""
    a, z = _ab(n, n1, q, o)
    return _fwd_q8_bytes(n, n1, q, o, bn) + 2 * t_bytes * z * bn


def plan_q8_train_bn(n, n1, q, o, npix_cap, save_t, t_bytes):
    """Largest q8 forward tile when the kernel also persists t."""
    if not save_t:
        return plan_q8_bn(n, n1, q, o, npix_cap)
    return _largest_bn(
        lambda bn: _fwd_q8t_bytes(n, n1, q, o, bn, t_bytes), cap=npix_cap
    )


def qat_save_decision(
    c, q, kernel_size, n1_plan, out_size, npix, compute_dtype, interpret,
    force_two_pass,
):
    """The QAT saved-t decision as a pure function of the layer config and a
    (possibly UNSHARDED) ``(out_size, npix)`` pair. Sharded QAT callers
    (tensor_parallel / spatial_parallel / sp_tp / the DP step) evaluate this
    with the GLOBAL out_size and pixel count so every shard — and the
    single-device run on the same global batch — lands on the SAME STE
    backward variant (saved dequantized t vs f32 recompute). Deriving it
    from local shard shapes instead could flip the decision near the
    saved-t HBM cap (a shard's smaller z·npix passes the cap where the
    global run's does not), silently changing gradients vs single-device."""
    from .eps_pallas import _save_t_plan, plan_pallas_call

    n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
        c, q, kernel_size, n1_plan, out_size, npix, compute_dtype, interpret
    )
    n_k, q_k, n1_k = _kernel_dims(c, q, kernel_size, n1, merge_pairs)
    npad = -(-npix // max(bn, 128)) * max(bn, 128)
    return (
        _save_t_plan(
            n_k, n1_k, q_k, out_size, bn, mm_dtype, npad, force_two_pass
        )
        is not None
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
def eps_pallas_apply_t_cmt_q8train(
    cmt32, xT, out_size, kernel_size, n1, bn, bn_q8, interpret, mm_dtype,
    merge_pairs, force_two_pass, save_t,
):
    """int8 (W8A8) forward for TRAINING with straight-through gradients:
    the forward runs the quantized kernel (weights re-quantized from the
    live f32 cmt every step — per-row scales are cheap jnp ops that XLA
    fuses), the backward is the f32/bf16 kernel family's, treating both
    quantizers as identity (STE). When ``save_t`` (decide it with
    ``qat_save_decision`` on the GLOBAL shapes so sharded and single-device
    runs agree), the backward's activation cotangent flows through the
    DEQUANTIZED t the quantized forward actually produced (the forward
    persists it); otherwise the backward recomputes t at full precision —
    a documented STE variant (the d_v half then sees unquantized t).

    ``bn`` is the f32 plan's tile (drives the backward tile ladder exactly
    like ``eps_pallas_apply_t_cmt``); ``bn_q8`` is the quantized forward's
    own tile. Views are padded to the larger of the two so both grids divide
    the pixel axis (the tile ladder is mutually divisible)."""
    out, _ = _q8train_fwd(
        cmt32, xT, out_size, kernel_size, n1, bn, bn_q8, interpret,
        mm_dtype, merge_pairs, force_two_pass, save_t,
    )
    return out


def _q8train_fwd(
    cmt32, xT, out_size, kernel_size, n1, bn, bn_q8, interpret, mm_dtype,
    merge_pairs, force_two_pass, save_t,
):
    c, q, h, w, b = xT.shape
    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    n_k, q_k, n1_k = _kernel_dims(c, q, kernel_size, n1, merge_pairs)
    views_t, npix = _stack_views_from_xT(
        xT, kernel_size, max(bn, bn_q8), merge_pairs
    )
    wq, sw = quantize_cmt(cmt32)
    if save_t:
        out_t, t = _run_fwd_q8(
            views_t, wq, sw, n1_k, out_size, bn_q8, interpret,
            save_t=True, t_dtype=jnp.dtype(mm_dtype),
        )
    else:
        out_t, t = (
            _run_fwd_q8(views_t, wq, sw, n1_k, out_size, bn_q8, interpret),
            None,
        )
    outT = out_t[:, :npix].reshape(out_size, hp, wp, b)
    return outT, (cmt32, xT, views_t, npix, t)


def _q8train_bwd(
    out_size, kernel_size, n1, bn, bn_q8, interpret, mm_dtype, merge_pairs,
    force_two_pass, save_t, res, g,
):
    from .eps_pallas import _bwd_dispatch, _dxT_from_dviews_t

    cmt32, xT, views_t, npix, t = res
    n1_k = n1 // 2 if merge_pairs else n1  # _kernel_dims' n1 rule
    dviews_t, d_cmt = _bwd_dispatch(
        views_t, cmt32.astype(mm_dtype), g, npix, n1_k, out_size, bn,
        interpret, mm_dtype, force_two_pass, t=t,
    )
    d_xT = _dxT_from_dviews_t(dviews_t, xT, kernel_size, npix, merge_pairs)
    return d_cmt, d_xT


eps_pallas_apply_t_cmt_q8train.defvjp(_q8train_fwd, _q8train_bwd)


def apply_q8train_layer(
    cmt, xT, plan, compute_dtype, interpret, first, out_size=None,
    save_shapes=None,
):
    """One EPS layer of the QAT (W8A8, STE) pipeline over the transposed
    batch-minor activations: xT (C, Q, H, W, B) → outT (O, H', W', B).

    ``out_size`` overrides ``plan["out_size"]`` when the caller runs a
    contiguous cmt ROW BLOCK instead of the full core (tensor-parallel
    shards, parallel/tensor_parallel.py): weight quantization is per-ROW, so
    quantizing the sliced rows equals slicing the full core's quantization —
    and activation quantization is per-PIXEL-column, so spatial-parallel
    row shards (whose pixel sets are local) likewise reproduce the
    single-device QAT numerics exactly. This is what makes --qat int8
    composable with --model-devices / --space-devices.

    ``save_shapes=(global_out_size, global_npix)`` makes the saved-t STE
    decision from the UNSHARDED shapes (``qat_save_decision``) — sharded
    callers MUST pass it, because the decision keys on out_size·npix (the
    saved-t HBM cap) and shard-local values could otherwise flip it near
    the threshold, selecting a different documented STE backward variant
    than the single-device run. Kernel tile planning stays shard-local."""
    from .eps_pallas import plan_pallas_call

    ch, qq, h, w, b = xT.shape
    k_ = plan["kernel_size"]
    out_size = plan["out_size"] if out_size is None else out_size
    hp, wp = h - k_ + 1, w - k_ + 1
    npix = b * hp * wp
    n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
        ch, qq, k_, plan["n1"], out_size, npix, compute_dtype, interpret
    )
    assert n1 == plan["n1"] and merge_pairs == plan["merge_pairs"]
    n_k, q_k, n1_k = _kernel_dims(ch, qq, k_, n1, merge_pairs)
    cap = max(128, -(-npix // 128) * 128)
    g_out, g_npix = (out_size, npix) if save_shapes is None else save_shapes
    will_save = qat_save_decision(
        ch, qq, k_, plan["n1"], g_out, g_npix, compute_dtype, interpret,
        first,
    )
    bn_q8 = plan_q8_train_bn(
        n_k, n1_k, q_k, out_size, cap, will_save,
        jnp.dtype(mm_dtype).itemsize,
    )
    if bn_q8 is None:
        raise ValueError(
            "EPS layer does not fit the q8 training kernel's VMEM "
            f"budget: (n={n_k}, n1={n1_k}, q={q_k}, o={out_size})"
        )
    return eps_pallas_apply_t_cmt_q8train(
        cmt, xT, out_size, k_, n1, bn, bn_q8, interpret, mm_dtype,
        merge_pairs, first, will_save,
    )


def forward_fast_q8train(
    fast, x, cfg, plans, *, training=False, rng=None, pixel_scale=1
):
    """``eps_plus_linear_forward_fast`` with every EPS layer's forward
    matmul running W8A8 int8 (STE backward) — the QAT training pipeline
    behind the runner's ``--qat int8``. Dropout composes: masks multiply
    the f32 cmt BEFORE quantization (the quantizers see the dropped
    weights, gradients flow through the mask by the chain rule outside the
    custom_vjp). The classifier stays f32.

    ``pixel_scale``: the data-parallel shard count when called inside a DP
    shard_map (parallel/data_parallel.py) — the saved-t STE decision is
    made on the GLOBAL pixel count (local · scale) so every shard and the
    equivalent single-device run on the concatenated batch pick the same
    backward variant (see ``qat_save_decision``)."""
    from ..models.eps_plus_linear import (
        _dropout_cmts,
        _transposed_classifier,
    )

    cmts = fast["epses_cmt"]
    if cfg.dropout_p < 1.0 and training:
        assert rng is not None, "dropout needs an rng key in training mode"
        cmts = _dropout_cmts(cmts, plans, cfg.dropout_p, rng)
    backend = cfg.train_backend if training else cfg.eval_backend
    assert backend in ("pallas", "pallas_interpret"), (
        "fast params run only on the Pallas pipeline"
    )
    interpret = backend == "pallas_interpret"
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    outT = None
    for i, (cmt, p) in enumerate(zip(cmts, plans)):
        _, _, h, w, b = xT.shape
        k_ = p["kernel_size"]
        g_npix = b * (h - k_ + 1) * (w - k_ + 1) * pixel_scale
        outT = apply_q8train_layer(
            cmt, xT, p, cfg.compute_dtype, interpret, i == 0,
            save_shapes=(p["out_size"], g_npix),
        )
        xT = outT[None]
    return _transposed_classifier(outT, fast["linear"])


def forward_fast_q8(qparams, x, cfg, plans, *, interpret=False):
    """The transposed Pallas serving pipeline over int8 params — the W8A8
    twin of ``eps_plus_linear_forward_fast`` (inference only). Split plans
    (n1 / merge_pairs) mirror the f32 fast path exactly, so autotuned splits
    baked into ``plans`` carry over; the tile size bn is re-planned for the
    q8 working set (the int8 resident core is 4× smaller, but the per-tile
    int8 u copy and int32 t make large-bn tiles bigger than f32's — the two
    plans are not interchangeable)."""
    from ..models.eps_plus_linear import _transposed_classifier
    from .eps_pallas import plan_pallas_call

    c0, b, h, w, q0 = x.shape
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    ch, qq, hh, ww = c0, q0, h, w
    outT = None
    for wq, sw, p in zip(qparams["epses_q"], qparams["epses_scale"], plans):
        k_, out_size = p["kernel_size"], p["out_size"]
        hp, wp = hh - k_ + 1, ww - k_ + 1
        npix = b * hp * wp
        n1, _bn_f32, merge_pairs, _mm = plan_pallas_call(
            ch, qq, k_, p["n1"], out_size, npix, None, interpret
        )
        assert n1 == p["n1"] and merge_pairs == p["merge_pairs"]
        n_k, q_k, n1_k = _kernel_dims(ch, qq, k_, n1, merge_pairs)
        cap = max(128, -(-npix // 128) * 128)
        bn = plan_q8_bn(n_k, n1_k, q_k, out_size, cap)
        if bn is None:  # a real config-dependent failure, not an internal
            # invariant — raise a catchable error (asserts strip under -O)
            raise ValueError(
                "EPS layer does not fit the q8 kernel's VMEM budget: "
                f"(n={n_k}, n1={n1_k}, q={q_k}, o={out_size})"
            )
        outT = eps_pallas_apply_t_q8(
            wq, sw, xT, out_size, k_, n1, bn, interpret, merge_pairs
        )
        xT = outT[None]
        ch, qq, hh, ww = 1, out_size, hp, wp
    return _transposed_classifier(outT, qparams["linear"])
