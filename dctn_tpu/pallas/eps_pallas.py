"""Fused Pallas TPU kernels for the EPS contraction (forward AND backward).

The XLA path is bandwidth-bound: its compiled grad accesses ~10.6 GB per
two-EPS step (XLA cost analysis) because the Khatri-Rao chain products, t and
the (v ⊗ g) product all round-trip HBM. These kernels keep all of that in
VMEM; only the window views, the output/cotangents, and (in backward) the u
and v⊗g tiles needed for the single outside d_core matmul touch HBM.

Mosaic layout rules shaped the kernel design:
- merges/splits of TINY dims must happen on LEADING axes (transposed
  (features, bn) layout with the pixel tile on lanes);
- reduction operands must be zero-offset, so the Khatri-Rao chains are built
  as SUFFIX products (new factor goes slowest) and the backward sweep peels
  factors from the FRONT — every slice is then a contiguous leading block;
- the matricized core is kept with OUTPUT-major rows (rows = (o, b)), so the
  per-output-channel slabs of t are contiguous too.

Wrapped in a custom_vjp so ``eps(..., backend="pallas")`` is differentiable;
residuals are just (core, stacked transposed views). Falls back to the XLA
path when the core doesn't fit the VMEM budget.

Capability note: this is the TPU-native analog of the reference's hand-chosen
opt_einsum contraction path (eps.py:25-40) taken two levels further down.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep the resident core + per-tile working set inside VMEM (16 MB hardware)
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


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


def _fwd_kernel_factory(n: int, n1: int, q: int, o: int, bn: int):
    n2 = n - n1

    def kernel(views_ref, cmt_ref, out_ref):
        # views_ref: (n, q, bn); cmt_ref: (Z=(o·q^n2), A) o-major rows;
        # out_ref: (o, bn)
        u = _suffix_chain(views_ref, 0, n1)[0]
        t = jnp.dot(cmt_ref[:], u, preferred_element_type=jnp.float32)  # (Z, bn)
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
        u_sufs = _suffix_chain(views_ref, 0, n1)
        u = u_sufs[0]
        g = g_ref[:]
        if n2 > 0:
            v_sufs = _suffix_chain(views_ref, n1, n)
            v = v_sufs[0]
            kr2 = (g[:, None, :] * v[None, :, :]).reshape(-1, g.shape[-1])
        else:
            kr2 = g
        # d_cmt[z, a] += Σ_n kr2[z, n]·u[a, n]
        part = jax.lax.dot_general(
            kr2, u, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(i == 0)
        def _():
            dcmt_ref[:] = part

        @pl.when(i > 0)
        def _():
            dcmt_ref[:] = dcmt_ref[:] + part

        d_u = jax.lax.dot_general(
            cmt_ref[:], kr2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        _chain_bwd(views_ref, u_sufs, d_u, 0, n1, dviews_ref)
        if n2 > 0:
            t = jnp.dot(cmt_ref[:], u, preferred_element_type=jnp.float32)
            t3 = t.reshape(o, q**n2, g.shape[-1])
            d_v = t3[0] * g[0:1, :]
            for oi in range(1, o):
                d_v = d_v + t3[oi] * g[oi : oi + 1, :]
            _chain_bwd(views_ref, v_sufs, d_v, n1, n, dviews_ref)

    return kernel


def _dcore_kernel_factory(n: int, n1: int, q: int, o: int, bn: int):
    """d_core accumulation pass — needs NO copy of the core in VMEM: just the
    views and g; d_cmt's output block is constant-indexed so it lives in VMEM
    across the whole (sequential) grid."""
    n2 = n - n1

    def kernel(views_ref, g_ref, dcmt_ref):
        i = pl.program_id(0)
        u = _suffix_chain(views_ref, 0, n1)[0]
        g = g_ref[:]
        if n2 > 0:
            v = _suffix_chain(views_ref, n1, n)[0]
            kr2 = (g[:, None, :] * v[None, :, :]).reshape(-1, g.shape[-1])
        else:
            kr2 = g
        part = jax.lax.dot_general(
            kr2, u, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(i == 0)
        def _():
            dcmt_ref[:] = part

        @pl.when(i > 0)
        def _():
            dcmt_ref[:] = dcmt_ref[:] + part

    return kernel


def _dviews_kernel_factory(n: int, n1: int, q: int, o: int, bn: int):
    """d_views pass — the core (but not its gradient) resident in VMEM."""
    n2 = n - n1

    def kernel(views_ref, cmt_ref, g_ref, dviews_ref):
        # views_ref: (n, q, bn); cmt_ref: (Z, A) o-major rows; g_ref: (o, bn)
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
            cmt_ref[:], kr2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        _chain_bwd(views_ref, u_sufs, d_u, 0, n1, dviews_ref)
        if n2 > 0:
            # t recomputed; rows (o, b) so per-o slabs are contiguous
            t = jnp.dot(cmt_ref[:], u, preferred_element_type=jnp.float32)
            t3 = t.reshape(o, q**n2, g.shape[-1])
            d_v = t3[0] * g[0:1, :]
            for oi in range(1, o):
                d_v = d_v + t3[oi] * g[oi : oi + 1, :]
            _chain_bwd(views_ref, v_sufs, d_v, n1, n, dviews_ref)

    return kernel


def pallas_forward_fits(n: int, n1: int, q: int, o: int, bn: int = 256) -> bool:
    """Whether the matricized core + tile working set fit the VMEM budget."""
    a, z = q**n1, q ** (n - n1) * o
    per_tile = 4 * bn * (2 * a + 2 * z + n * q + o)  # chains + t + views + out
    return 4 * a * z + per_tile < _VMEM_BUDGET_BYTES


def _core_to_cmt(core, n1):
    """Matricize with OUTPUT-major rows: cmt[(o, b), a] where a = first n1
    input dims, b = the rest (both row-major)."""
    n = core.ndim - 1
    q = core.shape[0]
    o = core.shape[-1]
    a, b = q**n1, q ** (n - n1)
    return core.reshape(a, b, o).transpose(2, 1, 0).reshape(o * b, a)


def _cmt_grad_to_core(d_cmt_t, core_shape, n1):
    """Inverse mapping for the (A, Z) gradient produced outside the kernel."""
    n = len(core_shape) - 1
    q = core_shape[0]
    o = core_shape[-1]
    a, b = q**n1, q ** (n - n1)
    return d_cmt_t.reshape(a, o, b).transpose(0, 2, 1).reshape(core_shape)


@partial(jax.jit, static_argnames=("n1", "out_size", "bn", "interpret"))
def _run_fwd(views_t, cmt, n1, out_size, bn, interpret):
    n, q, npad = views_t.shape
    out = pl.pallas_call(
        _fwd_kernel_factory(n, n1, q, out_size, bn),
        out_shape=jax.ShapeDtypeStruct((out_size, npad), jnp.float32),
        grid=(npad // bn,),
        in_specs=[
            pl.BlockSpec((n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(cmt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_size, bn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(views_t, cmt)
    return out


def bwd_fused_fits(n: int, n1: int, q: int, o: int, bn: int = 128) -> bool:
    """VMEM check for the fused-d_core backward: the resident core AND its
    gradient accumulator must both fit alongside the tile working set."""
    a, z = q**n1, q ** (n - n1) * o
    per_tile = 4 * bn * (2 * a + 3 * z + 2 * n * q + o)
    return 2 * 4 * a * z + per_tile < _VMEM_BUDGET_BYTES


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
    )(views_t, cmt, g_t)
    return dviews, d_cmt.T  # (A, Z) like the unfused path


@partial(jax.jit, static_argnames=("n1", "out_size", "bn", "interpret"))
def _run_bwd(views_t, cmt, g_t, n1, out_size, bn, interpret):
    """Two-pass backward with NOTHING large materialized in HBM: pass A
    accumulates d_core (no core copy resident), pass B computes d_views (core
    resident, no gradient accumulator). Both recompute the cheap VPU chains."""
    n, q, npad = views_t.shape
    z, a = cmt.shape
    grid = (npad // bn,)
    views_spec = pl.BlockSpec((n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((out_size, bn), lambda i: (0, i), memory_space=pltpu.VMEM)
    d_cmt = pl.pallas_call(
        _dcore_kernel_factory(n, n1, q, out_size, bn),
        out_shape=jax.ShapeDtypeStruct((z, a), jnp.float32),
        grid=grid,
        in_specs=[views_spec, g_spec],
        out_specs=pl.BlockSpec((z, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(views_t, g_t)
    dviews = pl.pallas_call(
        _dviews_kernel_factory(n, n1, q, out_size, bn),
        out_shape=jax.ShapeDtypeStruct((n, q, npad), jnp.float32),
        grid=grid,
        in_specs=[
            views_spec,
            pl.BlockSpec(cmt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            g_spec,
        ],
        out_specs=pl.BlockSpec(
            (n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(views_t, cmt, g_t)
    return dviews, d_cmt.T  # (A, Z)


def _stack_views_t(views, bn):
    n = len(views)
    in_size = views[0].shape[-1]
    b, hp, wp, _ = views[0].shape
    npix = b * hp * wp
    npad = -(-npix // bn) * bn
    vt = jnp.stack([v.reshape(npix, in_size).T for v in views], axis=0)
    if npad != npix:
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, npad - npix)))
    return vt, npix


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _eps_pallas(core, views, n1, bn, interpret):
    out, _ = _eps_pallas_fwd(core, views, n1, bn, interpret)
    return out


def _eps_pallas_fwd(core, views, n1, bn, interpret):
    n = len(views)
    out_size = core.shape[-1]
    b, hp, wp, _ = views[0].shape
    views_t, npix = _stack_views_t(views, bn)
    cmt = _core_to_cmt(core, n1)
    out_t = _run_fwd(views_t, cmt, n1, out_size, bn, interpret)
    out = out_t[:, :npix].T.reshape(b, hp, wp, out_size)
    return out, (core, views_t, (b, hp, wp), npix)


def _eps_pallas_bwd(n1, bn, interpret, res, g):
    core, views_t, (b, hp, wp), npix = res
    n, q, npad = views_t.shape
    out_size = core.shape[-1]
    cmt = _core_to_cmt(core, n1)
    g_t = g.reshape(npix, out_size).T
    if npad != npix:
        g_t = jnp.pad(g_t, ((0, 0), (0, npad - npix)))
    if bwd_fused_fits(n, n1, q, out_size, bn):
        dviews_t, d_cmt_t = _run_bwd_fused(
            views_t, cmt, g_t, n1, out_size, bn, interpret
        )
    else:
        dviews_t, d_cmt_t = _run_bwd(views_t, cmt, g_t, n1, out_size, bn, interpret)
    d_core = _cmt_grad_to_core(d_cmt_t, core.shape, n1)
    d_views = tuple(
        dviews_t[k, :, :npix].T.reshape(b, hp, wp, q) for k in range(n)
    )
    return d_core, d_views


_eps_pallas.defvjp(_eps_pallas_fwd, _eps_pallas_bwd)


def eps_pallas_forward(
    core: jax.Array,
    views,
    n1: int,
    bn: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused, differentiable EPS contraction over pre-extracted window
    ``views`` (n arrays of (B, H', W', Q)); returns (B, H', W', O)."""
    return _eps_pallas(core, tuple(views), n1, bn, interpret)
