"""Fused Pallas TPU kernels for the ConvSBS (string-bond / tensor-train)
contraction — forward AND backward.

Why: the XLA autodiff path of the legacy ConvSBS model is pure HBM burn —
measured 0.89 GFLOP but 14.3 GB accessed per step (bs=100, 2 layers, bond 4,
one v5e chip ≈ 887 GB/s ≈ the chip's HBM peak): every bond-chain fold
intermediate (B, H', W', O, l, r) round-trips HBM, forward and backward.
These kernels keep the whole fold in VMEM per pixel tile; only the factor
views, the output/cotangent and the (tiny) cores/gradients cross HBM.

Layouts, following the EPS kernels (eps_pallas.py):
- pixel tile on lanes: every per-pixel quantity is a (rows, bn) slab;
- fold state kept as rows ordered (b0, r, O) — b0 the ring bond (size 1 for
  open strings), r the current right bond, O the accumulated output-feature
  product in core order;
- per-core TT matrices m_i with rows ordered (l, r, o) so every slice the
  fold takes is a contiguous LEADING block (Mosaic's layout rule); the core
  matrix is row-permuted host-side to match;
- m_i built by a q^C-step broadcast-FMA — the per-position "matmul" has
  K = q^C ≤ 4, hopeless on the MXU, so everything here is VPU;
- all loops (bonds ≤ 4, q^C ≤ 4, cores ≤ 9) unroll at trace time into
  rank-≤3 leading-dim ops.

The channel Khatri-Rao merge, the core row permutation, the padding and the
output reshape live OUTSIDE the custom_vjp as plain jax ops — their VJPs
(unmerge contractions, inverse permutation, pad-of-slice) come from
autodiff, so the kernel pair only handles (views, cores) ↔ (d_views,
d_cores).

Scope: open strings AND trace_edge rings (the ring bond b0 ≤ 4 is carried
through the fold state as an extra leading dim and closed by an in-kernel
δ-trace); ≤3 channels (merged factor q^C ≤ 64 — covers the CIFAR-colored
C=3 strings); unsupported specs keep the XLA path silently.

Ring-loop note (measured r2, same-session A/B at bs 100 / 20 fenced iters):
vectorizing the b0 loop into the rows — fold state (r, b0, O) so each fold
op carries all ring-bond copies — is a DEAD END: 23.9 ms vs 21.9 ms for
this many-small-leading-blocks form. The bigger blocks force 4-D
broadcast products and U-block concatenations that lower into more Mosaic
relayout work than the extra unrolled ops cost.

Measured on v5e (legacy model, 2 layers, bond 4, long fenced windows —
unfenced timings on the async relay are garbage), r4 meet-in-the-middle
fold (see the MIM section below): open strings 1.76 ms vs 13.2 XLA at
bs 100 (7.5×), 7.28 vs 78.5 at bs 512 (10.8×); trace_edge rings 3.95 ms
vs 46.2 XLA (11.7×). r3 sequential-fold numbers: 2.61 / 12.7 / 8.97 ms.
History in experiments/conv_sbs_benchmark_results.json.

Capability parity: reference ``dctn/conv_sbs.py:258-304`` (forward) and its
torch autograd (backward), re-decomposed for the TPU memory hierarchy.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import os

import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Shared planning budget + Mosaic scoped-vmem lift (v5e VMEM is 128 MB;
# XLA's default scoped limit is only ~16 MB — see eps_pallas.py). r2's SBS
# plans were sized against a hardcoded 14 MB; r3 lifts them to the shared
# budget, which raises both the support cliff in sbs_plan and the bn tile
# candidates below (chip A/B, legacy 2-layer bond-4 step: bn 512→2048 took
# open strings 3.50→2.61 ms at bs 100 and 17.5→12.7 ms at bs 512; the
# trace_edge ring, bn 512→1024, went 20.1→8.97 ms).
from .eps_pallas import _VMEM_BUDGET_BYTES, _compiler_kwargs


# ---------------------------------------------------------------------------
# static plan


# above this merged-factor size the qc sweeps run as MXU dot_generals
# instead of trace-time qc× unrolled VPU multiply-adds (the unroll is the
# measured winner at the tiny qc of every recorded config; the dot form
# lifts the r2 qc ≤ 64 support cliff to the VMEM budget)
_QC_UNROLL_MAX = 64


def sbs_plan(spec):
    """Static kernel plan from an SBSSpecString: per-core (o, l, r), q^C,
    and whether the fused kernel supports the spec."""
    shapes = spec.shapes
    olr = tuple(
        (s.out_quantum_dim_size, s.bond_left_size, s.bond_right_size)
        for s in shapes
    )
    qc = spec.in_quantum_dim_size**spec.in_num_channels
    # VMEM feasibility at the smallest tile (bn=128): resident cores + the
    # per-tile working set of views/m/fold-state/output
    core_bytes = 4 * sum(l * r * o * qc for o, l, r in olr)
    rows_m = sum(l * r * o for o, l, r in olr)
    b0 = olr[0][1]
    rows_state = sum(b0 * max(l, r) * 64 for _, l, r in olr)
    o_total = int(np.prod([o for o, _, _ in olr]))
    per_bn = 4 * (len(olr) * qc * 3 + 2 * rows_m + rows_state + 4 * o_total)
    fits = core_bytes + 128 * per_bn < _VMEM_BUDGET_BYTES
    supported = (
        spec.in_num_channels <= 3  # CIFAR-colored strings are C=3
        and fits
        and spec.bond_sizes[0] <= 4  # ring bond unrolls an extra b0 loop
        and all(l <= 8 and r <= 8 for _, l, r in olr)
    )
    return olr, qc, supported


def sbs_pallas_profitable(spec) -> bool:
    """Whether the fused kernel should be used (measured faster than the XLA
    fold for every supported spec — open strings AND rings)."""
    return sbs_plan(spec)[2]


def _core_to_lro(core, o: int, l: int, r: int, qc: int):
    """Core dims (o, l, r) + (q,)*C → matrix (l·r·o, q^C): rows ordered
    (l, r, o) so the fold's per-(l, r) element blocks are leading slices."""
    mat = core.reshape(o, l, r, qc)
    return jnp.transpose(mat, (1, 2, 0, 3)).reshape(l * r * o, qc)


# ---------------------------------------------------------------------------
# in-kernel helpers (everything (rows, bn) slabs)


def _build_m(core_ref, v):
    """m[(l, r, o)-rows, bn] = Σ_qc core[(row), qc] · v[qc, bn]. Unrolled
    VPU multiply-adds at small qc (measured faster there — tiny rows); one
    MXU dot above _QC_UNROLL_MAX."""
    qc = v.shape[0]
    if qc > _QC_UNROLL_MAX:
        return jax.lax.dot_general(
            core_ref[:], v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    m = core_ref[:, 0:1] * v[0:1, :]
    for j in range(1, qc):
        m = m + core_ref[:, j : j + 1] * v[j : j + 1, :]
    return m


def _fold_left(acc, o_acc: int, m, l: int, o: int, r: int, b0: int):
    """acc rows (b0, r_prev=l, O) → rows (b0, r, O·o):
    acc2[(b, s, O, o)] = Σ_rp acc[(b, rp, O)]·m[(rp, s, o)]. The open-string
    case is b0 == 1 (the dangling left bond of core 0 carried through for
    the ring trace)."""
    bn = m.shape[-1]
    blocks = []
    for b in range(b0):
        acc_b = acc[b * l * o_acc : (b + 1) * l * o_acc]  # rows (rp, O)
        for s in range(r):
            out_s = None
            for rp in range(l):
                acc_rp = acc_b[rp * o_acc : (rp + 1) * o_acc]  # (O, bn)
                m_e = m[(rp * r + s) * o : (rp * r + s + 1) * o]  # (o, bn)
                prod = (acc_rp[:, None, :] * m_e[None, :, :]).reshape(
                    o_acc * o, bn
                )
                out_s = prod if out_s is None else out_s + prod
            blocks.append(out_s)
    return jnp.concatenate(blocks, axis=0)  # rows (b0, r, O·o)


def _fold_right(t_next, o_suf: int, m, l: int, o: int, r: int, b0: int):
    """Suffix fold, rows (b1, b0, o·O_suf):
    T_i[(b1, b, o, O_suf)] = Σ_s m[(b1, s, o)]·T_next[(s, b, O_suf)]."""
    bn = m.shape[-1]
    blocks = []
    for b1 in range(l):
        for b in range(b0):
            out = None
            for ss in range(r):
                m_e = m[(b1 * r + ss) * o : (b1 * r + ss + 1) * o]  # (o, bn)
                t_sb = t_next[
                    (ss * b0 + b) * o_suf : (ss * b0 + b + 1) * o_suf
                ]  # (O_suf, bn)
                prod = (m_e[:, None, :] * t_sb[None, :, :]).reshape(
                    o * o_suf, bn
                )
                out = prod if out is None else out + prod
            blocks.append(out)
    return jnp.concatenate(blocks, axis=0)  # rows (b1, b0, o·O_suf)


def _eye_rows(n: int, bn: int):
    """δ(i, j) as (n·n, bn) rows — the ring-closure identity operand.

    Built from materialized constant rows: Mosaic's vector layout pass
    aborts on reshape-of-broadcast (the stride-0 dim keeps physical size 1,
    "limits[i] <= dim(i)"), so no broadcast_to here."""
    return jnp.concatenate(
        [
            jnp.full((1, bn), 1.0 if i == j else 0.0, jnp.float32)
            for i in range(n)
            for j in range(n)
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# kernels


def _dcore_dv_rows(d_m, v, core_ref, qc: int, dcore_dot: bool):
    """The per-core gradient tail shared by both backward families:
    d_core[(l·r·o), qc] (per-tile partial, summed over the grid outside) and
    d_v[qc, bn]. ``dcore_dot`` routes BOTH contractions through MXU
    dot_generals at any qc — the unrolled form is qc cross-lane reductions
    (d_core) + qc sublane reductions (d_v) per core per tile, pure VPU
    shuffle latency; the dot form is one K=bn and one K=rows MXU pass
    (r5 phase-2 candidate, A/B'd on chip per shape by the SBS autotuner)."""
    if dcore_dot or qc > _QC_UNROLL_MAX:
        part = jax.lax.dot_general(
            d_m, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(
            core_ref[:], d_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return part, dv
    cols = []
    dv_rows = []
    for j in range(qc):
        cols.append(jnp.sum(d_m * v[j : j + 1, :], axis=1, keepdims=True))
        dv_rows.append(
            jnp.sum(core_ref[:, j : j + 1] * d_m, axis=0, keepdims=True)
        )
    return jnp.concatenate(cols, axis=1), jnp.concatenate(dv_rows, axis=0)


def _dcore_only_rows(d_m, v, qc: int, dcore_dot: bool):
    """d_core partial alone — the ``need_dviews=False`` tail (the input
    cotangent is statically dead, e.g. the model's layer 0 whose d_x flows
    into the untrained quantum map)."""
    if dcore_dot or qc > _QC_UNROLL_MAX:
        return jax.lax.dot_general(
            d_m, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jnp.concatenate(
        [
            jnp.sum(d_m * v[j : j + 1, :], axis=1, keepdims=True)
            for j in range(qc)
        ],
        axis=1,
    )


def _sbs_fwd_kernel_factory(olr, qc: int, bn: int):
    P = len(olr)
    b0 = olr[0][1]  # core 0's left bond == the ring bond (1 for open strings)

    def kernel(*refs):
        views_ref = refs[0]
        core_refs = refs[1 : 1 + P]
        out_ref = refs[1 + P]
        # core 0 rows (l, r, o) ARE the fold state layout (b0, r, O)
        acc = _build_m(core_refs[0], views_ref[0])
        o_acc = olr[0][0]
        for i in range(1, P):
            o, l, r = olr[i]
            m = _build_m(core_refs[i], views_ref[i])
            acc = _fold_left(acc, o_acc, m, l, o, r, b0)
            o_acc *= o
        # ring trace: out[O] = Σ_b acc[(b, r=b, O)]; trivial squeeze for b0=1
        out = acc[0:o_acc]
        for b in range(1, b0):
            out = out + acc[(b * b0 + b) * o_acc : (b * b0 + b + 1) * o_acc]
        out_ref[:] = out

    return kernel


def _sbs_bwd_kernel_factory(
    olr, qc: int, bn: int, need_dviews: bool = True, dcore_dot: bool = False
):
    P = len(olr)

    b0 = olr[0][1]

    def kernel(*refs):
        views_ref = refs[0]
        core_refs = refs[1 : 1 + P]
        g_ref = refs[1 + P]
        if need_dviews:
            dviews_ref = refs[2 + P]
            dcore_refs = refs[3 + P : 3 + 2 * P]
        else:
            dcore_refs = refs[2 + P : 2 + 2 * P]
        i_t = pl.program_id(0)

        ms = [_build_m(core_refs[i], views_ref[i]) for i in range(P)]

        # prefixes[i] = fold of cores 0..i-1, rows (b0, b_i, O_pre);
        # prefixes[0] is the ring-closure identity δ(b0, b_0)
        prefixes = [None] * P
        o_pres = [1] * P
        prefixes[0] = _eye_rows(b0, bn)
        acc = ms[0]
        o_acc = olr[0][0]
        for i in range(1, P):
            prefixes[i] = acc
            o_pres[i] = o_acc
            o, l, r = olr[i]
            if i < P - 1:
                acc = _fold_left(acc, o_acc, ms[i], l, o, r, b0)
                o_acc *= o

        # suffixes[i] = fold of cores i+1..P-1, rows (b_{i+1}, b0, O_suf);
        # the last suffix is the same ring-closure identity
        suffixes = [None] * P
        o_sufs = [1] * P
        t = _eye_rows(b0, bn)
        o_suf = 1
        for i in range(P - 1, 0, -1):
            suffixes[i] = t
            o_sufs[i] = o_suf
            o, l, r = olr[i]
            t = _fold_right(t, o_suf, ms[i], l, o, r, b0)
            o_suf *= o
        suffixes[0] = t
        o_sufs[0] = o_suf

        g = g_ref[:]  # rows (O_total)

        for i in range(P):
            o, l, r = olr[i]
            o_pre, o_suf_i = o_pres[i], o_sufs[i]
            # U[(b2, b)] rows (O_pre·o) = Σ_{O_suf} g[(O_pre,o,O_suf)]·suf[(b2,b)]
            g3 = g.reshape(o_pre * o, o_suf_i, bn)
            u_blocks = {}
            for b2 in range(r):
                for b in range(b0):
                    suf_b = suffixes[i][
                        (b2 * b0 + b) * o_suf_i : (b2 * b0 + b + 1) * o_suf_i
                    ]
                    u_blocks[(b2, b)] = jnp.sum(g3 * suf_b[None, :, :], axis=1)
            # d_m[(b1, b2, o)] = Σ_{b, O_pre} U[(b2, b)]·pre[(b, b1)]
            dm_rows = []
            for b1 in range(l):
                for b2 in range(r):
                    dmb = None
                    for b in range(b0):
                        u3 = u_blocks[(b2, b)].reshape(o_pre, o, bn)
                        pre_bb1 = prefixes[i][
                            (b * l + b1) * o_pre : (b * l + b1 + 1) * o_pre
                        ]
                        term = jnp.sum(u3 * pre_bb1[:, None, :], axis=0)
                        dmb = term if dmb is None else dmb + term
                    dm_rows.append(dmb)
            d_m = jnp.concatenate(dm_rows, axis=0)  # rows (l, r, o)

            # d_core[(l·r·o), qc] += Σ_n d_m · v ; d_v[qc] = Σ_rows core·d_m
            v = views_ref[i]
            if need_dviews:
                part, dv = _dcore_dv_rows(d_m, v, core_refs[i], qc, dcore_dot)
            else:
                part = _dcore_only_rows(d_m, v, qc, dcore_dot)

            @pl.when(i_t == 0)
            def _(part=part, ref=dcore_refs[i]):
                ref[:] = part

            @pl.when(i_t > 0)
            def _(part=part, ref=dcore_refs[i]):
                ref[:] = ref[:] + part

            if need_dviews:
                dviews_ref[i] = dv

    return kernel


# ---------------------------------------------------------------------------
# meet-in-the-middle (MIM) kernels — r4, VERDICT r3 #5's restructure.
#
# The sequential fold's work is dominated by its LATE terms: fold i costs
# b0·l·r·O_i·o_i·bn elementwise mults and O_i grows geometrically, so the
# total is ≈ b0·l·r·O_total·(o/(o−1)) — for o=2 chains, 32·b0·O_total per
# pixel tile. Folding from BOTH ends and merging in the middle
# (out[(O_pre,O_suf)] = Σ_{b0,r_m} pre ⊗ suf) caps each chain's state at
# O_half = √O_total and pays the O_total term exactly ONCE in the merge:
# ≈ b0·r_m·O_total ≈ 4·b0·O_total — an ~8× op reduction, for rings AND
# open strings. The backward reverses through the same two half-chains
# (every transpose touches only half-chain-sized states) plus the merge's
# two O_total-sized transposes — ≈ 3× the MIM forward instead of the old
# per-core prefix/suffix contractions (~P·r·b0·O_total). Same math, same
# (rows, bn) slab discipline; A/B'd on chip before becoming the default
# (docs/performance.md).


def _mim_cut(olr) -> int | None:
    """Merge position m (1 ≤ m ≤ P−1) minimizing total fold+merge mults,
    or None when the sequential fold is at least as cheap (P ≤ 2, or
    degenerate bond/feature patterns)."""
    P = len(olr)
    if P < 3:
        return None
    b0 = olr[0][1]

    def mim_cost(m):
        c, o_pre = 0, olr[0][0]
        for i in range(1, m):
            o, l, r = olr[i]
            c += b0 * l * r * o_pre * o
            o_pre *= o
        o_suf = 1
        for i in range(P - 1, m - 1, -1):
            o, l, r = olr[i]
            c += l * b0 * r * o * o_suf
            o_suf *= o
        return c + b0 * olr[m][1] * o_pre * o_suf

    seq, o_acc = 0, olr[0][0]
    for i in range(1, P):
        o, l, r = olr[i]
        seq += b0 * l * r * o_acc * o
        o_acc *= o
    best = min(range(1, P), key=mim_cost)
    return best if mim_cost(best) < seq else None


def _sbs_fwd_mim_kernel_factory(olr, qc: int, bn: int, mcut: int):
    P = len(olr)
    b0 = olr[0][1]

    def kernel(*refs):
        views_ref = refs[0]
        core_refs = refs[1 : 1 + P]
        out_ref = refs[1 + P]
        # prefix fold of cores 0..mcut-1: rows (b0, r_{m-1}, O_pre)
        acc = _build_m(core_refs[0], views_ref[0])
        o_pre = olr[0][0]
        for i in range(1, mcut):
            o, l, r = olr[i]
            m = _build_m(core_refs[i], views_ref[i])
            acc = _fold_left(acc, o_pre, m, l, o, r, b0)
            o_pre *= o
        # suffix fold of cores P-1..mcut: rows (l_m, b0, O_suf); the seed
        # δ(b0, b0) encodes the ring closure (all-ones for open strings)
        t = _eye_rows(b0, bn)
        o_suf = 1
        for i in range(P - 1, mcut - 1, -1):
            o, l, r = olr[i]
            m = _build_m(core_refs[i], views_ref[i])
            t = _fold_right(t, o_suf, m, l, o, r, b0)
            o_suf *= o
        # merge: out[(O_pre, O_suf)] = Σ_{b, r_m} pre[(b,rm)] ⊗ suf[(rm,b)]
        rm = olr[mcut][1]
        out = None
        for b in range(b0):
            for s in range(rm):
                pre_b = acc[(b * rm + s) * o_pre : (b * rm + s + 1) * o_pre]
                suf_b = t[(s * b0 + b) * o_suf : (s * b0 + b + 1) * o_suf]
                prod = (pre_b[:, None, :] * suf_b[None, :, :]).reshape(
                    o_pre * o_suf, bn
                )
                out = prod if out is None else out + prod
        out_ref[:] = out

    return kernel


def _sbs_bwd_mim_kernel_factory(
    olr, qc: int, bn: int, mcut: int,
    need_dviews: bool = True, dcore_dot: bool = False,
):
    P = len(olr)
    b0 = olr[0][1]

    def kernel(*refs):
        views_ref = refs[0]
        core_refs = refs[1 : 1 + P]
        g_ref = refs[1 + P]
        if need_dviews:
            dviews_ref = refs[2 + P]
            dcore_refs = refs[3 + P : 3 + 2 * P]
        else:
            dcore_refs = refs[2 + P : 2 + 2 * P]
        i_t = pl.program_id(0)

        ms = [_build_m(core_refs[i], views_ref[i]) for i in range(P)]

        # forward half-chains, keeping every intermediate state (all are
        # ≤ half-chain sized — the O_total blow-up of the old per-core
        # prefix/suffix tables never happens)
        lstates = [None] * mcut  # lstates[i]: state after folding 0..i
        o_pres = [olr[0][0]]
        acc = ms[0]
        lstates[0] = acc
        for i in range(1, mcut):
            o, l, r = olr[i]
            acc = _fold_left(acc, o_pres[-1], ms[i], l, o, r, b0)
            lstates[i] = acc
            o_pres.append(o_pres[-1] * o)
        o_pre = o_pres[-1]

        tnexts = [None] * P  # tnexts[i]: suffix state AFTER core i (i.e.
        o_sufs = [1] * P  # the fold of cores i+1..P-1), rows (r_i, b0, ·)
        t = _eye_rows(b0, bn)
        o_suf = 1
        for i in range(P - 1, mcut - 1, -1):
            tnexts[i] = t
            o_sufs[i] = o_suf
            o, l, r = olr[i]
            t = _fold_right(t, o_suf, ms[i], l, o, r, b0)
            o_suf *= o
        suf = t  # rows (l_mcut, b0, O_suf)
        o_suf_total = o_suf

        g = g_ref[:]
        g3 = g.reshape(o_pre, o_suf_total, bn)
        rm = olr[mcut][1]
        pre_state = lstates[mcut - 1]

        # merge transposes: the only O_total-sized work in this kernel
        dpre_blocks = []
        for b in range(b0):
            for s in range(rm):
                suf_b = suf[(s * b0 + b) * o_suf_total : (s * b0 + b + 1) * o_suf_total]
                dpre_blocks.append(jnp.sum(g3 * suf_b[None, :, :], axis=1))
        dacc = jnp.concatenate(dpre_blocks, axis=0)  # rows (b0, rm, O_pre)
        dsuf_blocks = []
        for s in range(rm):
            for b in range(b0):
                pre_b = pre_state[(b * rm + s) * o_pre : (b * rm + s + 1) * o_pre]
                dsuf_blocks.append(jnp.sum(g3 * pre_b[:, None, :], axis=0))
        dt = jnp.concatenate(dsuf_blocks, axis=0)  # rows (rm, b0, O_suf)

        dms = [None] * P

        # reverse the LEFT chain: fold_i: acc2[(b,s,(O,o))] = Σ_rp
        # acc[(b,rp,O)]·m[(rp,s,o)] → transposes w.r.t. m and acc
        for i in range(mcut - 1, 0, -1):
            o, l, r = olr[i]
            o_prev = o_pres[i - 1]
            prev = lstates[i - 1]  # rows (b0, l, O_prev)
            dm_rows = []
            dprev = [[None] * l for _ in range(b0)]
            for rp in range(l):
                for s in range(r):
                    dm_e = None
                    for b in range(b0):
                        d3 = dacc[
                            (b * r + s) * o_prev * o : (b * r + s + 1) * o_prev * o
                        ].reshape(o_prev, o, bn)
                        acc_b = prev[
                            (b * l + rp) * o_prev : (b * l + rp + 1) * o_prev
                        ]
                        term_dm = jnp.sum(d3 * acc_b[:, None, :], axis=0)
                        dm_e = term_dm if dm_e is None else dm_e + term_dm
                        m_e = ms[i][(rp * r + s) * o : (rp * r + s + 1) * o]
                        term_dp = jnp.sum(d3 * m_e[None, :, :], axis=1)
                        dprev[b][rp] = (
                            term_dp
                            if dprev[b][rp] is None
                            else dprev[b][rp] + term_dp
                        )
                    dm_rows.append(dm_e)
            dms[i] = jnp.concatenate(dm_rows, axis=0)  # rows (l, r, o)
            dacc = jnp.concatenate(
                [dprev[b][rp] for b in range(b0) for rp in range(l)], axis=0
            )  # rows (b0, l, O_prev)
        dms[0] = dacc  # state 0 IS m_0 (rows (b0=l_0, r_0, o_0))

        # reverse the RIGHT chain: T_i[(b1,b,(o,O_suf))] = Σ_s
        # m[(b1,s,o)]·T_next[(s,b,O_suf)] → transposes w.r.t. m and T_next
        for i in range(mcut, P):
            o, l, r = olr[i]
            o_sn = o_sufs[i]
            tn = tnexts[i]  # rows (r, b0, o_sn)
            dm_rows = []
            dtn = [[None] * b0 for _ in range(r)]
            for b1 in range(l):
                for s in range(r):
                    m_e = ms[i][(b1 * r + s) * o : (b1 * r + s + 1) * o]
                    dm_e = None
                    for b in range(b0):
                        d3 = dt[
                            (b1 * b0 + b) * o * o_sn : (b1 * b0 + b + 1) * o * o_sn
                        ].reshape(o, o_sn, bn)
                        tn_b = tn[(s * b0 + b) * o_sn : (s * b0 + b + 1) * o_sn]
                        term_dm = jnp.sum(d3 * tn_b[None, :, :], axis=1)
                        dm_e = term_dm if dm_e is None else dm_e + term_dm
                        term_dt = jnp.sum(d3 * m_e[:, None, :], axis=0)
                        dtn[s][b] = (
                            term_dt
                            if dtn[s][b] is None
                            else dtn[s][b] + term_dt
                        )
                    dm_rows.append(dm_e)  # one row block per (b1, s)
            dms[i] = jnp.concatenate(dm_rows, axis=0)  # rows (l, r, o)
            dt = jnp.concatenate(
                [dtn[s][b] for s in range(r) for b in range(b0)], axis=0
            )  # rows (r=l_{i+1}, b0, o_sn) — the next dT_next

        # per-core d_core / d_views from d_m (same math as the sequential
        # backward's tail)
        for i in range(P):
            o, l, r = olr[i]
            d_m = dms[i]
            v = views_ref[i]
            if need_dviews:
                part, dv = _dcore_dv_rows(d_m, v, core_refs[i], qc, dcore_dot)
            else:
                part = _dcore_only_rows(d_m, v, qc, dcore_dot)

            @pl.when(i_t == 0)
            def _(part=part, ref=dcore_refs[i]):
                ref[:] = part

            @pl.when(i_t > 0)
            def _(part=part, ref=dcore_refs[i]):
                ref[:] = ref[:] + part

            if need_dviews:
                dviews_ref[i] = dv

    return kernel


# ---------------------------------------------------------------------------
# host-side plumbing


def _merge_channel_views(xT, positions, qc: int):
    """xT: (C, Q, H, W, B) BATCH-MINOR → per-position merged factors
    (P, qc, npix) with flat pixel index ((h·W' + w)·B + b): the batch rides
    the TPU lane dimension, so the 5-D↔flat boundary reshapes (here and in
    the autodiffed output reshape's transpose) never need lane-granularity
    relayouts. Channel 0 is the slowest factor, matching the core's
    quantum-dim order (SBSCoreShape.as_tuple trailing (q,)*C, channel 0
    first)."""
    c, q, h, w, b = xT.shape
    max_h = max(p.h for p in positions)
    max_w = max(p.w for p in positions)
    hp, wp = h - max_h, w - max_w
    npix = b * hp * wp
    merged = []
    for pos in positions:
        fs = [
            xT[ch, :, pos.h : pos.h + hp, pos.w : pos.w + wp, :].reshape(q, npix)
            for ch in range(c)
        ]
        m = fs[0]
        for f in fs[1:]:
            m = (m[:, None, :] * f[None, :, :]).reshape(-1, npix)
        merged.append(m)
    return jnp.stack(merged, axis=0), npix, hp, wp


def _pick_bn(olr, qc: int, npix: int) -> int:
    b0 = olr[0][1]
    rows_m = sum(l * r * o for o, l, r in olr)
    rows_state = sum(
        b0 * max(l, r) * 64 for _, l, r in olr
    )  # prefixes + suffixes, generous
    o_total = int(np.prod([o for o, _, _ in olr]))
    per_bn = 4 * (len(olr) * qc * 3 + 2 * rows_m + rows_state + 4 * o_total)
    cap = max(128, -(-npix // 128) * 128)
    for bn in (2048, 1024, 512, 256, 128):
        if bn <= cap and bn * per_bn < _VMEM_BUDGET_BYTES:
            return bn
    return 128


@partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _conv_sbs_pallas(plan, cores_lro, views_t, interpret):
    out, _ = _conv_sbs_pallas_fwd(plan, cores_lro, views_t, interpret)
    return out


def _conv_sbs_pallas_fwd(plan, cores_lro, views_t, interpret):
    olr, qc, bn, mcut = plan[:4]
    P, _, npad = views_t.shape
    o_total = int(np.prod([o for o, _, _ in olr]))
    fwd_kernel = (
        _sbs_fwd_mim_kernel_factory(olr, qc, bn, mcut)
        if mcut is not None
        else _sbs_fwd_kernel_factory(olr, qc, bn)
    )
    out = pl.pallas_call(
        fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((o_total, npad), jnp.float32),
        grid=(npad // bn,),
        in_specs=[
            pl.BlockSpec((P, qc, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for c in cores_lro
        ],
        out_specs=pl.BlockSpec(
            (o_total, bn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(views_t, *cores_lro)
    return out, (cores_lro, views_t)


def _conv_sbs_pallas_bwd(plan, interpret, res, g):
    olr, qc, bn, mcut = plan[:4]
    need_dviews = plan[4] if len(plan) > 4 else True
    dcore_dot = plan[5] if len(plan) > 5 else False
    cores_lro, views_t = res
    P, _, npad = views_t.shape
    o_total = int(np.prod([o for o, _, _ in olr]))
    bwd_kernel = (
        _sbs_bwd_mim_kernel_factory(olr, qc, bn, mcut, need_dviews, dcore_dot)
        if mcut is not None
        else _sbs_bwd_kernel_factory(olr, qc, bn, need_dviews, dcore_dot)
    )
    dviews_shapes = (
        [jax.ShapeDtypeStruct((P, qc, npad), jnp.float32)] if need_dviews else []
    )
    dviews_specs = (
        [pl.BlockSpec((P, qc, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM)]
        if need_dviews
        else []
    )
    outs = pl.pallas_call(
        bwd_kernel,
        out_shape=tuple(
            dviews_shapes
            + [jax.ShapeDtypeStruct(c.shape, jnp.float32) for c in cores_lro]
        ),
        grid=(npad // bn,),
        in_specs=[
            pl.BlockSpec((P, qc, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for c in cores_lro
        ]
        + [pl.BlockSpec((o_total, bn), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=tuple(
            dviews_specs
            + [
                pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
                for c in cores_lro
            ]
        ),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(views_t, *cores_lro, g)
    if need_dviews:
        dviews, dcores = outs[0], tuple(outs[1:])
    else:
        # the caller declared the views cotangent statically dead (layer 0
        # feeding the untrained quantum map) — return zeros, which the
        # dead downstream unmerge ops absorb and XLA DCEs entirely
        dviews, dcores = jnp.zeros_like(views_t), tuple(outs)
    return dcores, dviews


_conv_sbs_pallas.defvjp(_conv_sbs_pallas_fwd, _conv_sbs_pallas_bwd)


def conv_sbs_pallas_t(
    spec,
    cores: Sequence[jax.Array],
    xT: jax.Array,
    interpret: bool = False,
    mim: "bool | None" = None,
    bn: "int | None" = None,
    mcut: "int | None" = None,
    need_dviews: bool = True,
    dcore_dot: "bool | None" = None,
) -> jax.Array:
    """Fused ConvSBS over the transposed batch-minor input xT
    (C, Q, H, W, B) → outT (∏out_q, H', W', B). Requires sbs_plan(spec) to
    report support.

    ``mim`` selects the kernel family explicitly (True = meet-in-the-middle
    fold, False = sequential bond fold); ``None`` defers to the
    ``DCTN_TPU_SBS_MIM`` env var. The env var is read at TRACE time: under
    an outer ``jax.jit`` it is baked into the compiled program, so toggling
    it mid-process does NOT retrace already-jitted callers — A/B harnesses
    must either set it before the first trace or pass ``mim=`` explicitly
    (an argument change makes the outer closure differ).

    Autotunable knobs (r5, measured per (spec, batch) by the SBS objective
    in ``train/autotune.py``): ``bn`` overrides the heuristic pixel-tile
    pick; ``mcut`` overrides the mult-count merge position (only meaningful
    with mim); ``dcore_dot`` routes the backward's d_core/d_v sweeps through
    MXU dot_generals instead of qc-unrolled cross-lane/sublane reductions
    (``None`` keeps the qc-threshold heuristic).

    ``need_dviews=False`` declares the INPUT cotangent statically dead —
    the backward kernel then skips the d_v sweeps and the (P, qc, npix)
    dviews write entirely, returning zeros for it. ONLY correct when the
    caller provably discards d_x (the legacy model's layer 0: its input is
    the quantum-mapped image, and the map has no trained parameters —
    mnist.py:132-141); the EPS family's analogous dead layer-0 cotangent is
    handled by force_two_pass + XLA DCE (eps_pallas.py)."""
    olr, qc, supported = sbs_plan(spec)
    assert supported, "unsupported spec for the fused SBS kernel"
    views_t, npix, hp, wp = _merge_channel_views(xT, spec.positions, qc)
    if bn is None:
        bn = _pick_bn(olr, qc, npix)
    npad = -(-npix // bn) * bn
    if npad != npix:
        views_t = jnp.pad(views_t, ((0, 0), (0, 0), (0, npad - npix)))
    cores_lro = tuple(
        _core_to_lro(c, o, l, r, qc) for c, (o, l, r) in zip(cores, olr)
    )
    # meet-in-the-middle fold when it costs fewer mults (~8x for o=2
    # chains, rings AND open strings)
    if mim is None:
        mim = os.environ.get("DCTN_TPU_SBS_MIM", "1") != "0"
    if mcut is None:
        mcut = _mim_cut(olr) if mim else None
    elif not mim:
        mcut = None
    else:
        assert 1 <= mcut < len(olr), f"merge cut {mcut} outside [1, {len(olr)})"
    plan = (olr, qc, bn, mcut, need_dviews, bool(dcore_dot))
    out = _conv_sbs_pallas(plan, cores_lro, views_t, interpret)
    b = xT.shape[4]
    o_total = int(np.prod([o for o, _, _ in olr]))
    return out[:, :npix].reshape(o_total, hp, wp, b)
