"""Fused Pallas TPU kernels for the EPS contraction (forward AND backward).

The XLA path is bandwidth-bound: its compiled grad accesses ~10.6 GB per
two-EPS step (XLA cost analysis) because the Khatri-Rao chain products, t and
the (v ⊗ g) product all round-trip HBM. These kernels keep all of that in
VMEM; only the window views, the output/cotangents and the d_core accumulator
block touch HBM.

Mosaic layout rules shaped the kernel design:
- merges/splits of TINY dims must happen on LEADING axes (transposed
  (features, bn) layout with the pixel tile on lanes);
- reduction operands must be zero-offset, so the Khatri-Rao chains are built
  as SUFFIX products (new factor goes slowest) and the backward sweep peels
  factors from the FRONT — every slice is then a contiguous leading block;
- the matricized core is kept with OUTPUT-major rows (rows = (o, b)), so the
  per-output-channel slabs of t are contiguous too.

Matmul precision (measured on v5e): Mosaic lowers an f32×f32 ``jnp.dot`` at
DEFAULT precision to ONE bf16 MXU pass (~144 TF/s observed; true multi-pass
f32 would cap at ~65 TF/s, and Precision.HIGHEST does not compile on this
backend). Since the hardware truncates the mantissas anyway, the kernels
store the matricized core and cast the chain products to bf16 EXPLICITLY
(``mm_dtype``): same numerics, ~7% faster, and the core's VMEM residency
halves — which is what lets the big layer run larger tiles and the fused
single-pass backward. Interpret mode (CPU tests) keeps f32 so oracles stay
exact; a dedicated test covers the bf16 operand path with bf16 tolerances.

Wrapped in a custom_vjp so ``eps(..., backend="pallas")`` is differentiable;
residuals are just (core, stacked transposed views). Falls back to the XLA
path when the core doesn't fit the VMEM budget.

Capability note: this is the TPU-native analog of the reference's hand-chosen
opt_einsum contraction path (eps.py:25-40) taken two levels further down.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Planning budget for the resident core + per-tile working set. v5e VMEM is
# 128 MB (measured on this chip: a 120 MB resident block compiles and runs;
# XLA's default scoped-vmem limit is only ~16 MB, raised per-kernel via
# CompilerParams.vmem_limit_bytes below). The analytic _*_bytes formulas
# undercount Mosaic's real allocation by up to ~2x (changing-index output
# blocks are double-buffered, and dot products materialize an f32 result
# tile before accumulating), so the budget stays well under half the
# hardware: plans validated on chip at 56 MB.
_VMEM_BUDGET_BYTES = int(os.environ.get("DCTN_TPU_VMEM_BUDGET_MB", "56")) << 20
_VMEM_LIMIT_BYTES = 127 * 1024 * 1024
_BN_CANDIDATES = (4096, 2048, 1024, 512, 256, 128)


def _compiler_kwargs(interpret: bool) -> dict:
    """Raise the Mosaic VMEM limit above XLA's ~16 MB scoped default so the
    planner can use the chip's real 128 MB (interpret mode takes none)."""
    if interpret:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
    }
# prefer the fused single-pass backward only when it can run a reasonable
# tile; below this the two-pass variant's bigger tiles win (measured)
_FUSED_MIN_BN = 256


def _ab(n: int, n1: int, q: int, o: int):
    return q**n1, q ** (n - n1) * o


def _fwd_bytes(n, n1, q, o, bn, mm_bytes):
    a, z = _ab(n, n1, q, o)
    return mm_bytes * a * z + 4 * bn * (2 * a + 2 * z + n * q + o)


def _fused_bytes(n, n1, q, o, bn, mm_bytes):
    a, z = _ab(n, n1, q, o)
    return (mm_bytes + 4) * a * z + 4 * bn * (2 * a + 3 * z + 2 * n * q + o)


def _fused_t_bytes(n, n1, q, o, bn, mm_bytes):
    """Fused backward consuming the forward-saved t: the in-kernel t
    recompute (a matmul + its f32 tile) is replaced by a double-buffered
    (z, bn) input block in the storage dtype."""
    a, z = _ab(n, n1, q, o)
    return (
        (mm_bytes + 4) * a * z
        + 4 * bn * (2 * a + 2 * z + 2 * n * q + o)
        + 2 * mm_bytes * z * bn
    )


def _dviews_t_bytes(n, n1, q, o, bn, mm_bytes):
    """d_views pass consuming the forward-saved t: the f32 t tile of the
    recompute is replaced by a double-buffered storage-dtype input block."""
    a, z = _ab(n, n1, q, o)
    return (
        mm_bytes * a * z
        + 4 * bn * (2 * a + 2 * z + 2 * n * q + o)
        + 2 * mm_bytes * z * bn
    )


def _dcore_bytes(n, n1, q, o, bn, mm_bytes, ot=None):
    """``ot``: number of output channels whose d_cmt rows are resident per
    grid step (o-tiled accumulator for cores whose full f32 d_cmt exceeds
    VMEM — e.g. the recorded three-EPS family's (K=3, Q=4, O=12) layer,
    12.6 MB); None = all of o (the single-block fast path)."""
    a, z = _ab(n, n1, q, o)
    if ot is None or ot == o:
        return 4 * a * z + 4 * bn * (2 * a + z + n * q + o)
    a2 = z // o  # q^(n-n1)
    z_t = ot * a2
    return 4 * a * z_t + 4 * bn * (2 * a + 2 * a2 + z_t + n * q + ot)


def _legal_ots(n, n1, q, o):
    """o-tile sizes whose pallas blocks Mosaic accepts, descending. The
    tiled pass blocks the f32 accumulator as (ot·q^n2, A) rows of the (Z, A)
    output — legal only when that row count is a sublane multiple (divisible
    by 8) or the tile is the whole array (ot == o). (The cotangent side is
    always legal: the tiled dispatch reshapes g to (o//ot, ot, npad) so its
    block's second-minor dim EQUALS the array dim — see _run_bwd.)"""
    a2 = q ** (n - n1)
    return sorted(
        (
            d
            for d in range(1, o + 1)
            if o % d == 0 and (d == o or (d * a2) % 8 == 0)
        ),
        reverse=True,
    )


def _dcore_plan(n, n1, q, o, bn_cap, mm_bytes):
    """(bn_a, ot) for the d_core pass: prefer the whole accumulator resident
    (ot=o, today's fast path), else the largest LEGAL o-divisor tile
    (_legal_ots) that fits; None when even the smallest legal tile at bn=128
    overflows."""
    for ot in _legal_ots(n, n1, q, o):
        bn_a = _largest_bn(
            lambda v: _dcore_bytes(n, n1, q, o, v, mm_bytes, ot), cap=bn_cap
        )
        if bn_a is not None:
            return bn_a, ot
    return None


def _dviews_bytes(n, n1, q, o, bn, mm_bytes):
    a, z = _ab(n, n1, q, o)
    return mm_bytes * a * z + 4 * bn * (2 * a + 3 * z + 2 * n * q + o)


def _largest_bn(bytes_fn, cap: int):
    for bn in _BN_CANDIDATES:
        if bn <= cap and bytes_fn(bn) < _VMEM_BUDGET_BYTES:
            return bn
    return None


def pallas_forward_fits(
    n: int, n1: int, q: int, o: int, bn: int = 128, mm_bytes: int = 4
) -> bool:
    """Go/no-go for the whole fused fwd+bwd pipeline: the forward, the
    d_views pass, and the d_core pass (at its smallest LEGAL o-tile,
    _legal_ots) must each fit the VMEM budget at the minimum tile. ``mm_bytes`` is the RESIDENT core's
    itemsize — pass the resolved mm_dtype's (2 on the real backend, where
    the MXU runs one bf16 pass at default precision anyway); the f32
    default is the conservative legacy gate. With mm_bytes=2 the recorded
    three-EPS family's (K=3, Q_in=4, O=12) layer (12.6 MB core) clears the
    gate: fwd/d_views hold a 6.3 MB bf16 core, and d_core tiles its f32
    accumulator over o."""
    ot_min = _legal_ots(n, n1, q, o)[-1]
    return (
        _fwd_bytes(n, n1, q, o, bn, mm_bytes) < _VMEM_BUDGET_BYTES
        and _dviews_bytes(n, n1, q, o, bn, mm_bytes) < _VMEM_BUDGET_BYTES
        and _dcore_bytes(n, n1, q, o, bn, mm_bytes, ot=ot_min)
        < _VMEM_BUDGET_BYTES
    )


# ---------------------------------------------------------------------------
# kernel bodies


def _suffix_chain(views_ref, start: int, stop: int):
    """Suffix Khatri-Rao products in (feat, bn) layout: sufs[k-start] =
    f_k ⊗ f_{k+1} ⊗ … ⊗ f_{stop-1} (row-major: f_k slowest). sufs[0] is the
    full product of the half."""
    sufs = [None] * (stop - start)
    sufs[-1] = views_ref[stop - 1]
    for k in range(stop - 2, start - 1, -1):
        f = views_ref[k]
        s = sufs[k - start + 1]
        sufs[k - start] = (f[:, None, :] * s[None, :, :]).reshape(-1, s.shape[-1])
    return sufs


def _chain_bwd(views_ref, sufs, d_prod, start: int, stop: int, dviews_ref):
    """Front-peel sweep writing each factor's cotangent into dviews_ref[k].
    All slices are contiguous leading blocks (zero-offset for Mosaic)."""
    d = d_prod
    for k in range(start, stop - 1):
        f = views_ref[k]
        qk = f.shape[0]
        bn = d.shape[-1]
        suffix = sufs[k - start + 1]  # (rest, bn)
        d3 = d.reshape(qk, -1, bn)
        rows = [
            jnp.sum(d3[qi] * suffix, axis=0, keepdims=True) for qi in range(qk)
        ]
        dviews_ref[k] = jnp.concatenate(rows, axis=0)
        nxt = d3[0] * f[0:1, :]
        for qi in range(1, qk):
            nxt = nxt + d3[qi] * f[qi : qi + 1, :]
        d = nxt
    dviews_ref[stop - 1] = d


def _fwd_kernel_factory(n: int, n1: int, q: int, o: int, bn: int, save_t=False):
    n2 = n - n1

    def kernel(views_ref, cmt_ref, out_ref, *t_refs):
        # views_ref: (n, q, bn); cmt_ref: (Z=(o·q^n2), A) o-major rows,
        # mm_dtype; out_ref: (o, bn); t_refs: ((Z, bn) storage-dtype,) when
        # save_t — the t intermediate persisted for the backward, which then
        # skips its t-recompute matmul (1 of its 3 MXU passes).
        md = cmt_ref.dtype
        u = _suffix_chain(views_ref, 0, n1)[0]
        t = jnp.dot(cmt_ref[:], u.astype(md), preferred_element_type=jnp.float32)
        if save_t:
            t_refs[0][:] = t.astype(t_refs[0].dtype)
        if n2 > 0:
            v = _suffix_chain(views_ref, n1, n)[0]
            t3 = t.reshape(o, q**n2, bn)
            rows = [
                jnp.sum(t3[oi] * v, axis=0, keepdims=True) for oi in range(o)
            ]
            out = jnp.concatenate(rows, axis=0)
        else:
            out = t
        out_ref[:] = out

    return kernel


def _bwd_fused_kernel_factory(n: int, n1: int, q: int, o: int, bn: int):
    """Backward with the d_core accumulation INSIDE the kernel: nothing but
    views/g/dviews crosses HBM; d_cmt lives in VMEM across the whole grid
    (its block index is constant) and is initialized on the first tile."""
    n2 = n - n1

    def kernel(views_ref, cmt_ref, g_ref, dviews_ref, dcmt_ref):
        i = pl.program_id(0)
        md = cmt_ref.dtype
        u_sufs = _suffix_chain(views_ref, 0, n1)
        u = u_sufs[0]
        um = u.astype(md)
        g = g_ref[:]
        if n2 > 0:
            v_sufs = _suffix_chain(views_ref, n1, n)
            v = v_sufs[0]
            kr2 = (g[:, None, :] * v[None, :, :]).reshape(-1, g.shape[-1])
        else:
            kr2 = g
        kr2m = kr2.astype(md)
        # d_cmt[z, a] += Σ_n kr2[z, n]·u[a, n]
        part = jax.lax.dot_general(
            kr2m, um, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(i == 0)
        def _():
            dcmt_ref[:] = part

        @pl.when(i > 0)
        def _():
            dcmt_ref[:] = dcmt_ref[:] + part

        d_u = jax.lax.dot_general(
            cmt_ref[:], kr2m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        _chain_bwd(views_ref, u_sufs, d_u, 0, n1, dviews_ref)
        if n2 > 0:
            t = jnp.dot(cmt_ref[:], um, preferred_element_type=jnp.float32)
            t3 = t.reshape(o, q**n2, g.shape[-1])
            d_v = t3[0] * g[0:1, :]
            for oi in range(1, o):
                d_v = d_v + t3[oi] * g[oi : oi + 1, :]
            _chain_bwd(views_ref, v_sufs, d_v, n1, n, dviews_ref)

    return kernel


def _bwd_fused_t_kernel_factory(n: int, n1: int, q: int, o: int, bn: int):
    """Fused backward consuming the forward-saved t instead of recomputing
    it: 2 MXU passes per tile (d_cmt, d_u) rather than 3. Profitable when
    a = q^n1 is large — the removed matmul costs 2·a·z flops/column while the
    saved t streams z storage-dtype bytes/column through HBM, fully pipelined
    behind the remaining compute."""
    n2 = n - n1
    assert n2 > 0  # t == out when n2 == 0; nothing to save

    def kernel(views_ref, cmt_ref, g_ref, t_ref, dviews_ref, dcmt_ref):
        i = pl.program_id(0)
        md = cmt_ref.dtype
        u_sufs = _suffix_chain(views_ref, 0, n1)
        um = u_sufs[0].astype(md)
        g = g_ref[:]
        v_sufs = _suffix_chain(views_ref, n1, n)
        v = v_sufs[0]
        kr2 = (g[:, None, :] * v[None, :, :]).reshape(-1, g.shape[-1])
        kr2m = kr2.astype(md)
        part = jax.lax.dot_general(
            kr2m, um, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(i == 0)
        def _():
            dcmt_ref[:] = part

        @pl.when(i > 0)
        def _():
            dcmt_ref[:] = dcmt_ref[:] + part

        d_u = jax.lax.dot_general(
            cmt_ref[:], kr2m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        _chain_bwd(views_ref, u_sufs, d_u, 0, n1, dviews_ref)
        t3 = t_ref[:].astype(jnp.float32).reshape(o, q**n2, g.shape[-1])
        d_v = t3[0] * g[0:1, :]
        for oi in range(1, o):
            d_v = d_v + t3[oi] * g[oi : oi + 1, :]
        _chain_bwd(views_ref, v_sufs, d_v, n1, n, dviews_ref)

    return kernel


def _dcore_kernel_factory(
    n: int, n1: int, q: int, o: int, bn: int, mm_dtype, pix_axis: int = 0
):
    """d_core accumulation pass — needs NO copy of the core in VMEM: just the
    views and g; d_cmt's output block is constant-indexed along the pixel
    grid axis so it lives in VMEM across that whole (sequential) sweep.
    ``pix_axis=1`` is the o-TILED variant: grid (o//ot, npix//bn), g arrives
    as this tile's (1, ot, bn) block of the host-side (o//ot, ot, npad)
    reshape (3-D so the block's second-minor dim EQUALS the array dim —
    Mosaic rejects a partial (ot, bn) block of (o, npad) unless ot is a
    sublane multiple) and the accumulator holds only the tile's (ot·q^n2, A)
    rows — how cores whose full f32 d_cmt exceeds VMEM (the three-EPS
    family's 12.6 MB layer) still get a fused backward. The body is
    identical: kr2's row count simply follows g's block."""
    n2 = n - n1

    def kernel(views_ref, g_ref, dcmt_ref):
        i = pl.program_id(pix_axis)
        u = _suffix_chain(views_ref, 0, n1)[0]
        g = g_ref[0] if pix_axis == 1 else g_ref[:]
        if n2 > 0:
            v = _suffix_chain(views_ref, n1, n)[0]
            kr2 = (g[:, None, :] * v[None, :, :]).reshape(-1, g.shape[-1])
        else:
            kr2 = g
        part = jax.lax.dot_general(
            kr2.astype(mm_dtype),
            u.astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            dcmt_ref[:] = part

        @pl.when(i > 0)
        def _():
            dcmt_ref[:] = dcmt_ref[:] + part

    return kernel


def _dviews_kernel_factory(n: int, n1: int, q: int, o: int, bn: int, use_t=False):
    """d_views pass — the core (but not its gradient) resident in VMEM.
    With ``use_t`` the forward-saved t arrives as an input and the pass runs
    a single MXU matmul (d_u) instead of two (d_u + t-recompute)."""
    n2 = n - n1
    assert not (use_t and n2 == 0)

    def kernel(views_ref, cmt_ref, g_ref, *rest):
        # views_ref: (n, q, bn); cmt_ref: (Z, A) o-major rows; g_ref: (o, bn)
        t_ref, dviews_ref = (rest[0], rest[1]) if use_t else (None, rest[0])
        md = cmt_ref.dtype
        u_sufs = _suffix_chain(views_ref, 0, n1)
        u = u_sufs[0]
        g = g_ref[:]
        if n2 > 0:
            v_sufs = _suffix_chain(views_ref, n1, n)
            v = v_sufs[0]
            # kr2[(o, b), n] = g[o, n] · v[b, n]  (o slowest, matching cmt)
            kr2 = (g[:, None, :] * v[None, :, :]).reshape(-1, g.shape[-1])
        else:
            kr2 = g
        # d_u[a, n] = Σ_z cm[a, z]·kr2[z, n]  (cmt is (Z, A))
        d_u = jax.lax.dot_general(
            cmt_ref[:], kr2.astype(md), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        _chain_bwd(views_ref, u_sufs, d_u, 0, n1, dviews_ref)
        if n2 > 0:
            if use_t:
                t = t_ref[:].astype(jnp.float32)
            else:
                # t recomputed; rows (o, b) so per-o slabs are contiguous
                t = jnp.dot(
                    cmt_ref[:], u.astype(md), preferred_element_type=jnp.float32
                )
            t3 = t.reshape(o, q**n2, g.shape[-1])
            d_v = t3[0] * g[0:1, :]
            for oi in range(1, o):
                d_v = d_v + t3[oi] * g[oi : oi + 1, :]
            _chain_bwd(views_ref, v_sufs, d_v, n1, n, dviews_ref)

    return kernel


# ---------------------------------------------------------------------------
# host-side plumbing


def _core_to_cmt(core, n1):
    """Matricize with OUTPUT-major rows: cmt[(o, b), a] where a = first n1
    input dims, b = the rest (both row-major)."""
    n = core.ndim - 1
    q = core.shape[0]
    o = core.shape[-1]
    a, b = q**n1, q ** (n - n1)
    return core.reshape(a, b, o).transpose(2, 1, 0).reshape(o * b, a)


@partial(jax.jit, static_argnames=("n1", "out_size", "bn", "interpret", "save_t"))
def _run_fwd(views_t, cmt, n1, out_size, bn, interpret, save_t=False):
    n, q, npad = views_t.shape
    z = cmt.shape[0]
    out_shape = jax.ShapeDtypeStruct((out_size, npad), jnp.float32)
    out_spec = pl.BlockSpec((out_size, bn), lambda i: (0, i), memory_space=pltpu.VMEM)
    if save_t:
        out_shape = (out_shape, jax.ShapeDtypeStruct((z, npad), cmt.dtype))
        out_spec = (
            out_spec,
            pl.BlockSpec((z, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        )
    out = pl.pallas_call(
        _fwd_kernel_factory(n, n1, q, out_size, bn, save_t),
        out_shape=out_shape,
        grid=(npad // bn,),
        in_specs=[
            pl.BlockSpec((n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(cmt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(views_t, cmt)
    return out


@partial(jax.jit, static_argnames=("n1", "out_size", "bn", "interpret"))
def _run_bwd_fused(views_t, cmt, g_t, n1, out_size, bn, interpret):
    n, q, npad = views_t.shape
    z, a = cmt.shape
    dviews, d_cmt = pl.pallas_call(
        _bwd_fused_kernel_factory(n, n1, q, out_size, bn),
        out_shape=(
            jax.ShapeDtypeStruct((n, q, npad), jnp.float32),
            jax.ShapeDtypeStruct((z, a), jnp.float32),
        ),
        grid=(npad // bn,),
        in_specs=[
            pl.BlockSpec((n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(cmt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((z, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(views_t, cmt, g_t)
    return dviews, d_cmt  # (Z, A) — cmt's own layout


@partial(jax.jit, static_argnames=("n1", "out_size", "bn", "interpret"))
def _run_bwd_fused_t(views_t, cmt, g_t, t, n1, out_size, bn, interpret):
    n, q, npad = views_t.shape
    z, a = cmt.shape
    dviews, d_cmt = pl.pallas_call(
        _bwd_fused_t_kernel_factory(n, n1, q, out_size, bn),
        out_shape=(
            jax.ShapeDtypeStruct((n, q, npad), jnp.float32),
            jax.ShapeDtypeStruct((z, a), jnp.float32),
        ),
        grid=(npad // bn,),
        in_specs=[
            pl.BlockSpec((n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(cmt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((z, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((z, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(views_t, cmt, g_t, t)
    return dviews, d_cmt  # (Z, A) — cmt's own layout


@partial(
    jax.jit,
    static_argnames=(
        "n1", "out_size", "bn_a", "bn_b", "interpret", "mm_dtype", "ot"
    ),
)
def _run_bwd(
    views_t, cmt, g_t, n1, out_size, bn_a, bn_b, interpret, mm_dtype, t=None,
    ot=None,
):
    """Two-pass backward with NOTHING large materialized in HBM: pass A
    accumulates d_core (no core copy resident), pass B computes d_views (core
    resident, no gradient accumulator). Both recompute the cheap VPU chains;
    each pass runs the largest tile its VMEM footprint allows. With the
    forward-saved ``t``, pass B streams it instead of recomputing its matmul.
    ``ot < out_size`` runs pass A o-TILED (grid (o//ot, pix), the accumulator
    block revisited across the inner pixel sweep) for cores whose full f32
    d_cmt exceeds VMEM."""
    n, q, npad = views_t.shape
    z, a = cmt.shape
    views_spec = lambda bn: pl.BlockSpec(
        (n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    g_spec = lambda bn: pl.BlockSpec(
        (out_size, bn), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    if ot is None or ot == out_size:
        d_cmt = pl.pallas_call(
            _dcore_kernel_factory(n, n1, q, out_size, bn_a, mm_dtype),
            out_shape=jax.ShapeDtypeStruct((z, a), jnp.float32),
            grid=(npad // bn_a,),
            in_specs=[views_spec(bn_a), g_spec(bn_a)],
            out_specs=pl.BlockSpec(
                (z, a), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
            **_compiler_kwargs(interpret),
        )(views_t, g_t)
    else:
        z_t = ot * (z // out_size)
        # g as (o//ot, ot, npad): the (1, ot, bn) block's second-minor dim
        # equals the array dim, so any divisor tile is a legal block (the
        # 2-D (ot, bn) block of (o, npad) is rejected by Mosaic's
        # sublane-multiple rule whenever ot % 8 != 0 — e.g. the three-EPS
        # family's o=12, ot=6).
        g3 = g_t.reshape(out_size // ot, ot, npad)
        d_cmt = pl.pallas_call(
            _dcore_kernel_factory(
                n, n1, q, out_size, bn_a, mm_dtype, pix_axis=1
            ),
            out_shape=jax.ShapeDtypeStruct((z, a), jnp.float32),
            grid=(out_size // ot, npad // bn_a),
            in_specs=[
                pl.BlockSpec(
                    (n, q, bn_a), lambda zt, i: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ot, bn_a), lambda zt, i: (zt, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (z_t, a), lambda zt, i: (zt, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
            **_compiler_kwargs(interpret),
        )(views_t, g3)
    use_t = t is not None
    b_inputs = [views_t, cmt, g_t] + ([t] if use_t else [])
    b_specs = [
        views_spec(bn_b),
        pl.BlockSpec(cmt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        g_spec(bn_b),
    ] + (
        [pl.BlockSpec((z, bn_b), lambda i: (0, i), memory_space=pltpu.VMEM)]
        if use_t
        else []
    )
    dviews = pl.pallas_call(
        _dviews_kernel_factory(n, n1, q, out_size, bn_b, use_t),
        out_shape=jax.ShapeDtypeStruct((n, q, npad), jnp.float32),
        grid=(npad // bn_b,),
        in_specs=b_specs,
        out_specs=pl.BlockSpec(
            (n, q, bn_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(*b_inputs)
    return dviews, d_cmt  # (Z, A) — cmt's own layout


def _slice_specs(kernel_size: int, num_channels: int):
    """(δh, δw, c) per view, in window_views order: position-major,
    channel-minor (windows.py:44-48)."""
    return tuple(
        (dh, dw, c)
        for dh in range(kernel_size)
        for dw in range(kernel_size)
        for c in range(num_channels)
    )


def _stack_views_from_xT(xT, kernel_size: int, bn: int, merge_pairs: bool):
    """Build the (n, q, npad) factor stack from the TRANSPOSED input
    ``xT``: (C, Q, H, W, B) — BATCH-MINOR, so the batch (usually a multiple
    of 128) sits on the TPU lane dimension and every host-side merge/split
    between the 5-D spatial form and the kernels' flat pixel axis
    (n = (h·W' + w)·B + b) touches only leading/sublane dims. The
    batch-MAJOR convention made the backward's cotangent flatten a
    lane-granularity relayout (~0.5 ms/step measured at bs=128). Every view
    is a static (q, npix) slice; the stack is a copy, never a
    tiny-trailing-dim transpose (XLA lowers those as slow relayouts,
    ~5 ms per layer at bs=2048).

    ``merge_pairs``: Khatri-Rao adjacent view pairs host-side so q=2 chains
    run as q²=4 kernels — halves the in-kernel chain depth and doubles
    sublane utilization of the (q, bn) rows."""
    c, q, h, w, b = xT.shape
    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    npix = b * hp * wp
    views = [
        xT[ch, :, dh : dh + hp, dw : dw + wp, :].reshape(q, npix)
        for dh, dw, ch in _slice_specs(kernel_size, c)
    ]
    if merge_pairs:
        views = [
            (views[2 * i][:, None, :] * views[2 * i + 1][None, :, :]).reshape(
                q * q, npix
            )
            for i in range(len(views) // 2)
        ]
    vt = jnp.stack(views, axis=0)
    npad = -(-npix // bn) * bn
    if npad != npix:
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, npad - npix)))
    return vt, npix


def _dxT_from_dviews_t(dviews_t, xT, kernel_size: int, npix: int, merge_pairs: bool):
    """Per-factor cotangents → d(xT), all in the transposed batch-minor
    layout. For the merged-pair path, unmerge first: d_f0 = Σ_b
    d_m[(a,b)]·f1[b] and d_f1 = Σ_a d_m[(a,b)]·f0[a] (f values re-sliced
    from xT, free)."""
    c, q, h, w, b = xT.shape
    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    specs = _slice_specs(kernel_size, c)
    if merge_pairs:
        fs = [
            xT[ch, :, dh : dh + hp, dw : dw + wp, :].reshape(q, npix)
            for dh, dw, ch in specs
        ]
        dvs = []
        for i in range(len(specs) // 2):
            dm = dviews_t[i, :, :npix].reshape(q, q, npix)
            f0, f1 = fs[2 * i], fs[2 * i + 1]
            dvs.append(jnp.einsum("abn,bn->an", dm, f1))
            dvs.append(jnp.einsum("abn,an->bn", dm, f0))
    else:
        dvs = [dviews_t[k, :, :npix] for k in range(len(specs))]
    # Sum-of-pads instead of .at[].add scatter: XLA fuses the pad+add tree
    # into one elementwise kernel, whereas a chain of strided window scatters
    # lowers to sequential read-modify-writes (measured 42 ms vs ~2 ms for
    # the 16 views of the K=4 layer at bs=2048).
    per_channel = [None] * c
    for (dh, dw, ch), dv in zip(specs, dvs):
        padded = jnp.pad(
            dv.reshape(q, hp, wp, b),
            ((0, 0), (dh, h - hp - dh), (dw, w - wp - dw), (0, 0)),
        )
        per_channel[ch] = padded if per_channel[ch] is None else per_channel[ch] + padded
    return jnp.stack(per_channel, axis=0).astype(xT.dtype)  # (C, Q, H, W, B)


def _resolve_mm_dtype(mm_dtype, interpret):
    """bf16 operands on the real backend (the MXU truncates to bf16 in its
    single DEFAULT-precision pass anyway); exact f32 in interpret mode so the
    CPU oracles stay tight."""
    if mm_dtype is not None:
        return jnp.dtype(mm_dtype)
    return jnp.dtype(jnp.float32) if interpret else jnp.dtype(jnp.bfloat16)


def _kernel_dims(c: int, q: int, kernel_size: int, n1: int, merge_pairs: bool):
    """(n_k, q_k, n1_k) as seen by the kernels after optional pair-merging."""
    n = kernel_size**2 * c
    if merge_pairs:
        return n // 2, q * q, n1 // 2
    return n, q, n1


def _core_to_cmt_k(core, n1_k, q_k):
    """Matricize for the kernel's (possibly pair-merged) factor dims: the
    row-major reshape of (q,)*n to (q²,)*(n/2) is a no-op on memory, so the
    merged view pairing (f_{2i} slowest) lines up with the core's dims."""
    n_total = core.size // core.shape[-1]
    o = core.shape[-1]
    a = q_k**n1_k
    b = n_total // a
    return core.reshape(a, b, o).transpose(2, 1, 0).reshape(o * b, a)


def _cmt_grad_to_core_k(d_cmt_t, core_shape, n1_k, q_k):
    """Inverse of _core_to_cmt_k for the (A, Z) gradient."""
    import math

    o = core_shape[-1]
    n_total = math.prod(core_shape[:-1])
    a = q_k**n1_k
    b = n_total // a
    return d_cmt_t.reshape(a, o, b).transpose(0, 2, 1).reshape(core_shape)


# The primary op works ENTIRELY in the transposed BATCH-MINOR layout —
# xT: (C, Q, H, W, B) → outT: (O, H', W', B) — so a multi-layer model chains
# without a single relayout (outT[None] IS the next layer's xT), and the
# batch axis (a lane-width multiple in training) stays on TPU lanes through
# every host-side reshape. The reference-layout wrapper below adds the two
# boundary transposes for the public eps() surface.


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def eps_pallas_apply_t(
    core, xT, kernel_size, n1, bn, interpret, mm_dtype, merge_pairs,
    force_two_pass,
):
    """``force_two_pass``: route the backward through the two separate
    (d_core, d_views) kernels even when the fused one fits. A model's FIRST
    layer should set this: its input cotangent is discarded by the
    surrounding grad, and because the d_views pass is its own pallas_call,
    XLA dead-code-eliminates it — the backward collapses to the single
    d_core matmul with no wrong-gradient trap (d_x stays correct whenever
    someone does consume it)."""
    out, _ = _eps_pallas_t_fwd(
        core, xT, kernel_size, n1, bn, interpret, mm_dtype, merge_pairs,
        force_two_pass,
    )
    return out


def _eps_pallas_t_fwd(
    core, xT, kernel_size, n1, bn, interpret, mm_dtype, merge_pairs,
    force_two_pass,
):
    out_size = core.shape[-1]
    c, q, h, w, b = xT.shape
    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    n_k, q_k, n1_k = _kernel_dims(c, q, kernel_size, n1, merge_pairs)
    views_t, npix = _stack_views_from_xT(xT, kernel_size, bn, merge_pairs)
    cmt = _core_to_cmt_k(core, n1_k, q_k).astype(mm_dtype)
    save = _save_t_plan(
        n_k, n1_k, q_k, out_size, bn, mm_dtype, views_t.shape[-1],
        force_two_pass,
    )
    if save is not None:
        out_t, t = _run_fwd(
            views_t, cmt, n1_k, out_size, bn, interpret, save_t=True
        )
    else:
        out_t, t = _run_fwd(views_t, cmt, n1_k, out_size, bn, interpret), None
    outT = out_t[:, :npix].reshape(out_size, hp, wp, b)
    return outT, (core, xT, views_t, npix, t)


def _save_t_plan(
    n_k, n1_k, q_k, out_size, bn, mm_dtype, npad, force_two_pass
):
    """Decide (identically at forward-residual-save and backward-dispatch
    time) whether the backward should consume a forward-saved t: returns the
    backward tile size, or None. Profitable when a = q_k^n1_k is large —
    the removed t-recompute matmul costs 2·a·z flops per pixel column while
    the saved t moves 2·z storage bytes through HBM (break-even near
    a ≈ peak_flops·bytes/bw ≈ 415 for bf16 on v5e; the margin also covers
    the forward's extra write). Capped by the t buffer's HBM footprint."""
    import os

    n2 = n_k - n1_k
    if force_two_pass or n2 <= 0:
        return None
    a = q_k**n1_k
    if a < int(os.environ.get("DCTN_TPU_SAVE_T_MIN_A", "512")):
        return None
    mm_bytes = jnp.dtype(mm_dtype).itemsize
    z = q_k**n2 * out_size
    cap_bytes = int(os.environ.get("DCTN_TPU_SAVE_T_MAX_BYTES", str(4 << 30)))
    if z * npad * mm_bytes > cap_bytes:
        return None
    bn_t = _largest_bn(
        lambda v: _fused_t_bytes(n_k, n1_k, q_k, out_size, v, mm_bytes), cap=bn
    )
    if bn_t is not None and bn_t >= _FUSED_MIN_BN:
        return ("fused_t", bn_t)
    plan_a = _dcore_plan(n_k, n1_k, q_k, out_size, bn, mm_bytes)
    bn_b = _largest_bn(
        lambda v: _dviews_t_bytes(n_k, n1_k, q_k, out_size, v, mm_bytes), cap=bn
    )
    if plan_a is not None and bn_b is not None:
        return ("two_t", plan_a, bn_b)
    return None


def save_t_capped(c, q, kernel_size, n1, out_size, npix, compute_dtype):
    """True iff the saved-t backward is disabled ONLY by the t buffer's HBM
    footprint cap at this pixel count — i.e. the same layer WOULD save t at
    a smaller microbatch. Static/cheap; the runner uses it to suggest
    ``--grad-accum-steps`` at large batch (docs/performance.md,
    "large-batch recipe": measured +22% at bs 8192)."""
    n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
        c, q, kernel_size, n1, out_size, npix, compute_dtype, False
    )
    n_k, q_k, n1_k = _kernel_dims(c, q, kernel_size, n1, merge_pairs)
    npad = -(-npix // bn) * bn
    if _save_t_plan(n_k, n1_k, q_k, out_size, bn, mm_dtype, npad, False):
        return False
    # Capped ⇔ the same plan WOULD fire with the t buffer shrunk to one
    # tile (npad=bn) — re-asking _save_t_plan keeps the two decisions
    # identical (MIN_A threshold, VMEM tile search) with no duplicated
    # constants.
    return (
        _save_t_plan(n_k, n1_k, q_k, out_size, bn, mm_dtype, bn, False)
        is not None
    )


def _bwd_dispatch(
    views_t, cmt, g, npix, n1_k, out_size, bn, interpret, mm_dtype,
    force_two_pass, t=None,
):
    """Shared backward tile planning + kernel dispatch for BOTH parameter
    layouts: pads the cotangent, picks saved-t vs fused vs two-pass, and
    returns (dviews_t, d_cmt) with d_cmt in the (Z, A) cmt layout."""
    n_k, q_k, npad = views_t.shape
    mm_bytes = jnp.dtype(mm_dtype).itemsize
    g_t = g.reshape(out_size, npix)
    if npad != npix:
        g_t = jnp.pad(g_t, ((0, 0), (0, npad - npix)))
    if t is not None:
        plan = _save_t_plan(
            n_k, n1_k, q_k, out_size, bn, mm_dtype, npad, force_two_pass
        )
        assert plan is not None  # fwd saved t under the same static plan
        if plan[0] == "fused_t":
            return _run_bwd_fused_t(
                views_t, cmt, g_t, t, n1_k, out_size, plan[1], interpret
            )
        bn_a, ot = plan[1]
        return _run_bwd(
            views_t, cmt, g_t, n1_k, out_size, bn_a, plan[2], interpret,
            mm_dtype, t=t, ot=ot,
        )
    bn_f = _largest_bn(
        lambda v: _fused_bytes(n_k, n1_k, q_k, out_size, v, mm_bytes), cap=bn
    )
    if not force_two_pass and bn_f is not None and bn_f >= _FUSED_MIN_BN:
        return _run_bwd_fused(views_t, cmt, g_t, n1_k, out_size, bn_f, interpret)
    plan_a = _dcore_plan(n_k, n1_k, q_k, out_size, bn, mm_bytes)
    bn_b = _largest_bn(
        lambda v: _dviews_bytes(n_k, n1_k, q_k, out_size, v, mm_bytes), cap=bn
    )
    assert plan_a is not None and bn_b is not None, (n_k, n1_k, q_k, out_size, bn)
    bn_a, ot = plan_a
    return _run_bwd(
        views_t, cmt, g_t, n1_k, out_size, bn_a, bn_b, interpret, mm_dtype,
        ot=ot,
    )


def _eps_pallas_t_bwd(
    kernel_size, n1, bn, interpret, mm_dtype, merge_pairs, force_two_pass,
    res, g,
):
    core, xT, views_t, npix, t = res
    _, q_k, _ = views_t.shape
    out_size = core.shape[-1]
    n1_k = n1 // 2 if merge_pairs else n1  # _kernel_dims' n1 rule (c, q are
    # not in scope here; n_k/q_k come from the saved views)
    cmt = _core_to_cmt_k(core, n1_k, q_k).astype(mm_dtype)
    dviews_t, d_cmt = _bwd_dispatch(
        views_t, cmt, g, npix, n1_k, out_size, bn, interpret, mm_dtype,
        force_two_pass, t=t,
    )
    d_core = _cmt_grad_to_core_k(d_cmt.T, core.shape, n1_k, q_k)
    d_xT = _dxT_from_dviews_t(dviews_t, xT, kernel_size, npix, merge_pairs)
    return d_core, d_xT


eps_pallas_apply_t.defvjp(_eps_pallas_t_fwd, _eps_pallas_t_bwd)


# ---------------------------------------------------------------------------
# cmt-native entry: the core arrives ALREADY matricized ("fast" param layout)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def eps_pallas_apply_t_cmt(
    cmt32, xT, out_size, kernel_size, n1, bn, interpret, mm_dtype,
    merge_pairs, force_two_pass,
):
    """``eps_pallas_apply_t`` with the core stored in the kernel's
    matricized (Z, A) float32 layout (``models.eps_plus_linear``'s fast
    param layout). The 10-D→matrix transpose, its bf16-cast fusion and the
    gradient unpermute cost ~3.2 ms per flagship step — batch-independent,
    measured late-r2 — and disappear entirely when the matrix IS the stored
    parameter: the forward only casts a dense 2-D array, and the backward's
    d_cmt is returned in the parameter's own (Z, A) layout straight from the
    kernel."""
    out, _ = _eps_pallas_t_cmt_fwd(
        cmt32, xT, out_size, kernel_size, n1, bn, interpret, mm_dtype,
        merge_pairs, force_two_pass,
    )
    return out


def _eps_pallas_t_cmt_fwd(
    cmt32, xT, out_size, kernel_size, n1, bn, interpret, mm_dtype,
    merge_pairs, force_two_pass,
):
    c, q, h, w, b = xT.shape
    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    n_k, q_k, n1_k = _kernel_dims(c, q, kernel_size, n1, merge_pairs)
    views_t, npix = _stack_views_from_xT(xT, kernel_size, bn, merge_pairs)
    save = _save_t_plan(
        n_k, n1_k, q_k, out_size, bn, mm_dtype, views_t.shape[-1],
        force_two_pass,
    )
    cmtm = cmt32.astype(mm_dtype)
    if save is not None:
        out_t, t = _run_fwd(
            views_t, cmtm, n1_k, out_size, bn, interpret, save_t=True
        )
    else:
        out_t, t = _run_fwd(views_t, cmtm, n1_k, out_size, bn, interpret), None
    outT = out_t[:, :npix].reshape(out_size, hp, wp, b)
    return outT, (cmt32, xT, views_t, npix, t)


def _eps_pallas_t_cmt_bwd(
    out_size, kernel_size, n1, bn, interpret, mm_dtype, merge_pairs,
    force_two_pass, res, g,
):
    cmt32, xT, views_t, npix, t = res
    n1_k = n1 // 2 if merge_pairs else n1  # _kernel_dims' n1 rule
    dviews_t, d_cmt = _bwd_dispatch(
        views_t, cmt32.astype(mm_dtype), g, npix, n1_k, out_size, bn,
        interpret, mm_dtype, force_two_pass, t=t,
    )
    d_xT = _dxT_from_dviews_t(dviews_t, xT, kernel_size, npix, merge_pairs)
    return d_cmt, d_xT


eps_pallas_apply_t_cmt.defvjp(_eps_pallas_t_cmt_fwd, _eps_pallas_t_cmt_bwd)


def plan_pallas_call(c, q, kernel_size, n1, out_size, npix, mm_dtype, interpret):
    """Resolve (n1, bn, merge_pairs, mm_dtype) for one EPS layer's pallas
    call — the static plan shared by the layout wrappers and the transposed
    model pipeline."""
    n = kernel_size**2 * c
    mm_dtype = _resolve_mm_dtype(mm_dtype, interpret)
    merge_pairs = q == 2 and n % 2 == 0
    if merge_pairs and n1 % 2 == 1:
        n1 += 1 if n1 + 1 <= n else -1  # merged halves need an even split
    n_k, q_k, n1_k = _kernel_dims(c, q, kernel_size, n1, merge_pairs)
    cap = max(128, -(-npix // 128) * 128)
    bn = _largest_bn(
        lambda v: _fwd_bytes(n_k, n1_k, q_k, out_size, v, mm_dtype.itemsize),
        cap=min(cap, _BN_CANDIDATES[0]),
    )
    assert bn is not None, (n_k, n1_k, q_k, out_size)
    return n1, bn, merge_pairs, mm_dtype


def eps_pallas_apply(
    core: jax.Array,
    x: jax.Array,
    kernel_size: int,
    n1: int,
    bn: int | None = None,
    interpret: bool = False,
    mm_dtype=None,
) -> jax.Array:
    """Fused, differentiable EPS contraction in the reference layout:
    ``x`` (C, B, H, W, Q) → (B, H', W', O). Two boundary relayouts wrap the
    transposed primary op; multi-layer models should use the transposed
    pipeline (models/eps_plus_linear.py) which has none."""
    c, b, h, w, q = x.shape
    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    n1, bn_r, merge_pairs, mm_dtype = plan_pallas_call(
        c, q, kernel_size, n1, core.shape[-1], b * hp * wp, mm_dtype, interpret
    )
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    outT = eps_pallas_apply_t(
        core, xT, kernel_size, n1, bn if bn is not None else bn_r,
        interpret, mm_dtype, merge_pairs, False,
    )
    return jnp.transpose(outT, (3, 1, 2, 0))


