"""EPS — the Entangled Plaquette State patch-contraction operator, TPU-first.

Semantics (parity with reference ``dctn/eps.py``): given a dense core of shape
``(Q,)*(K²·C) + (O,)`` and an input of shape ``(C, B, H, W, Q)``, contract the
core with every K×K window of rank-one feature vectors, producing
``(B, H-K+1, W-K+1, O)``.

TPU-first design
----------------
Each window is a rank-one tensor ⊗ᵢ vᵢ, so contracting the dense core with it
is ``vec(⊗ᵢ vᵢ) · core_matrix``. Materializing the full Khatri-Rao vector
(dim Q^(K²C), e.g. 2¹⁶ for K=4) per window would blow up HBM, so we use the
half-split factorization (the staged-contraction idea the reference bakes into
its opt_einsum path, eps.py:25-30, rebuilt here for the MXU):

    u = KR(first ⌈n/2⌉ factors)   — (B,H',W', Q^n1)   cheap VPU broadcasts
    v = KR(rest)                  — (B,H',W', Q^n2)
    t = u @ core.reshape(Q^n1, Q^n2·O)        ← ONE large MXU matmul
    out[..., o] = Σ_b v[..., b] · t[..., b, o] ← fused VPU reduce

All FLOPs land in a single (N, Q^n1) × (Q^n1, Q^n2·O) matmul with N = B·H'·W'
rows, which XLA tiles straight onto the 128×128 systolic array. The Khatri-Rao
builds are log-depth elementwise broadcasts that XLA fuses. Everything is
shape-static, so one compilation per layer spec.

``eps_one_by_one`` keeps the sequential-absorption form (eps.py:43-63) as a
low-memory oracle used by tests.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .windows import window_views, out_spatial


# ---------------------------------------------------------------------------
# shape helpers


def eps_shape(
    kernel_size: int, in_num_channels: int, in_size: int, out_size: int
) -> Tuple[int, ...]:
    """Shape an EPS core with these parameters must have (eps.py:66-70)."""
    return (in_size,) * (kernel_size**2 * in_num_channels) + (out_size,)


def is_eps(a) -> bool:
    """Whether ``a`` plausibly is an EPS core, judging by shape (eps.py:115)."""
    return a.ndim >= 2 and all(s == a.shape[0] for s in a.shape[:-1])


def matrix_shape(core) -> Tuple[int, int]:
    """(out_size, total_in_size) of the matricized core (eps.py:99-103)."""
    assert is_eps(core)
    return core.shape[-1], math.prod(core.shape[:-1])


def total_in_dim_size(kernel_size: int, in_num_channels: int, in_size: int) -> int:
    return in_size ** (in_num_channels * kernel_size**2)


def _infer_kernel_size(core, num_channels: int) -> int:
    k = math.isqrt((core.ndim - 1) // num_channels)
    if k * k * num_channels != core.ndim - 1:
        raise ValueError(
            f"core ndim {core.ndim} incompatible with {num_channels} channels"
        )
    return k


# ---------------------------------------------------------------------------
# the operator


def khatri_rao(factors: Sequence[jax.Array]) -> jax.Array:
    """Row-wise Kronecker product over the last axis: (..., a) ⊗ (..., b) →
    (..., a·b), with the FIRST factor slowest-varying (row-major), matching a
    row-major reshape of the dense core's leading dims."""
    out = factors[0]
    for f in factors[1:]:
        out = (out[..., :, None] * f[..., None, :]).reshape(*out.shape[:-1], -1)
    return out


# VPU ops are ~this many times slower than MXU flops on v5e-class chips
# (197 TF/s bf16 MXU peak vs a few TF/s of vector multiplies); the exact
# value only has to rank splits, not predict times.
_VPU_MXU_RATIO = 64


def _balanced_split(n: int, q: int, out_size: int) -> int:
    """Choose how many factors go in the matmul (u) half.

    Numerically any split is identical; the pick minimizes a TPU cost model
    of one pixel column through the Pallas kernels (measured r3: the old
    "smallest n1 with q^n1 ≥ 128" rule gave the (K=2, Q=12, O=24) layer a
    contracting dim of 144, which the MXU pads to 256 — the kernel ran at
    60 TF/s vs 181 for a 128-aligned sibling):

    - MXU: 2 · pad128(q^n1) · q^(n-n1)·O — the matmul with its contracting
      dim padded to the 128-wide systolic array;
    - VPU (serial with the MXU inside a Mosaic grid step): the suffix
      Khatri-Rao chains (≈ 4/3·(q^n1 + q^(n-n1))), the final O·q^(n-n1)
      output contraction, and the bf16 cast of u.

    When q == 2 and n is even the Pallas plan merges factor pairs
    (plan_pallas_call), which requires an even n1 — odd candidates are
    skipped so the post-merge nudge cannot land on a worse split than the
    model chose.
    """
    candidates = split_candidates(n, q)
    return min(candidates, key=lambda n1: (_split_cost(n, q, out_size, n1), n1))


def _split_cost(n: int, q: int, out_size: int, n1: int) -> float:
    """The analytic per-pixel cost model behind ``_balanced_split`` (also
    the candidate ranking for the empirical split autotuner,
    train/autotune.py)."""
    a, b = q**n1, q ** (n - n1)
    pad_a = -(-a // 128) * 128
    mxu = 2 * pad_a * b * out_size
    vpu = 4.0 / 3.0 * (a + b) + out_size * b + a
    return mxu + _VPU_MXU_RATIO * vpu


def split_candidates(n: int, q: int) -> list:
    """Legal matmul splits for an n-factor EPS layer: every 1 ≤ n1 ≤ n,
    restricted to even values when the Pallas plan will merge factor pairs
    (q == 2, even n) so the post-merge nudge cannot change the pick."""
    merge_pairs = q == 2 and n % 2 == 0
    out = [n1 for n1 in range(1, n + 1) if not (merge_pairs and n1 % 2)]
    assert out  # merge_pairs requires even n ≥ 2, so n itself qualifies
    return out


def _kr_prefixes_t(factors_t: Sequence[jax.Array]):
    """Prefix Khatri-Rao products in TRANSPOSED layout: factors (q, N) →
    [(q₁, N), (q₁q₂, N), …]. The huge flattened pixel dim N stays on the TPU
    lane dimension, so every step is a fully-utilized VPU broadcast; the
    row-major combined index keeps factor 1 slowest-varying (matching a
    row-major reshape of the core's leading dims)."""
    prods = [factors_t[0]]
    for f in factors_t[1:]:
        p = prods[-1]
        n = p.shape[-1]
        prods.append((p[:, None, :] * f[None, :, :]).reshape(-1, n))
    return prods


def _kr_chain_bwd_t(factors_t, prefixes_t, d_prod_t):
    """Cotangents of every (q, N) factor of a transposed Khatri-Rao chain:
    suffix sweep, each step an elementwise multiply + reduction over a LEADING
    (small) axis — N stays on lanes throughout."""
    d_factors = [None] * len(factors_t)
    d = d_prod_t
    for k in range(len(factors_t) - 1, 0, -1):
        qk = factors_t[k].shape[0]
        n = d.shape[-1]
        d3 = d.reshape(-1, qk, n)  # (prod_{<k}, q_k, N)
        d_factors[k] = jnp.sum(d3 * prefixes_t[k - 1][:, None, :], axis=0)
        d = jnp.sum(d3 * factors_t[k][None, :, :], axis=1)
    d_factors[0] = d
    return d_factors


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _eps_contract(core, views, n1, compute_dtype):
    out, _ = _eps_contract_fwd(core, views, n1, compute_dtype)
    return out


def _maybe(x, dtype):
    return x if dtype is None else x.astype(dtype)


def _eps_contract_fwd(core, views, n1, compute_dtype):
    """out[n, o] = Σ_{a,b} u[a,n]·v[b,n]·core[a,b,o], computed entirely in
    transposed (features, N) layout: Khatri-Rao halves as lane-efficient VPU
    broadcasts, then ONE large MXU matmul, then a fused reduce. Only the tiny
    (O, N) result is transposed back at the end."""
    n = len(views)
    in_size = views[0].shape[-1]
    out_size = core.shape[-1]
    b, hp, wp, _ = views[0].shape
    npix = b * hp * wp
    acc_dtype = jnp.promote_types(core.dtype, views[0].dtype)
    views_t = tuple(v.reshape(npix, in_size).T for v in views)  # (Q, N)
    u_prefixes = _kr_prefixes_t(views_t[:n1])
    # materialization barrier: without it XLA fuses the whole Khatri-Rao
    # chain into EVERY consumer matmul's operand read, recomputing it once
    # per consumer (measured 3-6× step blowup)
    u_prefixes = list(jax.lax.optimization_barrier(tuple(u_prefixes)))
    u_t = u_prefixes[-1]  # (Q^n1, N)
    cm = core.reshape(in_size**n1, in_size ** (n - n1) * out_size)
    t_t = jax.lax.dot_general(
        _maybe(cm, compute_dtype),
        _maybe(u_t, compute_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )  # (Q^(n-n1)·O, N)
    if n1 == n:
        out = t_t.T.reshape(b, hp, wp, out_size)
        return out, (core, views_t, u_prefixes, None, None, (b, hp, wp))
    v_prefixes = list(
        jax.lax.optimization_barrier(tuple(_kr_prefixes_t(views_t[n1:])))
    )
    v_t = v_prefixes[-1]  # (Q^n2, N)
    t3 = t_t.reshape(in_size ** (n - n1), out_size, npix)
    out_t = jnp.sum(v_t[:, None, :].astype(acc_dtype) * t3, axis=0)  # (O, N)
    out = out_t.T.reshape(b, hp, wp, out_size)
    return out, (core, views_t, u_prefixes, v_prefixes, t3, (b, hp, wp))


def _eps_contract_bwd(n1, compute_dtype, res, g):
    """Explicit backward in the same transposed layout — the heavy cotangents
    are plain MXU dot_generals:
        d_core = (v ⊗ g) ·contract-N· u     d_u = coreᵀ·(v ⊗ g)
        d_v    = Σ_o t·g                    (t is the stored intermediate)
    then the Khatri-Rao suffix sweeps. XLA autodiff of the staged forward ran
    ~18× the forward cost on TPU (lane-padded chain intermediates); this
    version keeps N on lanes everywhere."""
    core, views_t, u_prefixes, v_prefixes, t3, (b, hp, wp) = res
    n = len(views_t)
    in_size = views_t[0].shape[0]
    out_size = core.shape[-1]
    npix = views_t[0].shape[-1]
    acc_dtype = jnp.promote_types(core.dtype, views_t[0].dtype)
    u_t = u_prefixes[-1]
    cm = core.reshape(in_size**n1, in_size ** (n - n1) * out_size)
    g_t = g.reshape(npix, out_size).T  # (O, N)

    if v_prefixes is None:  # degenerate n1 == n: out was cmᵀ @ u
        d_cm = jax.lax.dot_general(
            _maybe(u_t, compute_dtype), _maybe(g_t, compute_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=acc_dtype,
        )  # (Q^n1, O)
        d_u = jax.lax.dot_general(
            _maybe(cm, compute_dtype), _maybe(g_t, compute_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype,
        )  # (Q^n1, N)
        d_views_t = _kr_chain_bwd_t(views_t[:n1], u_prefixes, d_u)
        d_views = tuple(
            d.T.reshape(b, hp, wp, in_size) for d in d_views_t
        )
        return d_cm.reshape(core.shape), d_views

    v_t = v_prefixes[-1]
    # KR2[(b, o), n] = v[b, n] · g[o, n]; barrier'd — it feeds two matmuls
    kr2 = jax.lax.optimization_barrier(
        (v_t[:, None, :] * g_t[None, :, :]).reshape(-1, npix)
    )
    d_cm = jax.lax.dot_general(
        _maybe(u_t, compute_dtype), _maybe(kr2, compute_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=acc_dtype,
    )  # (Q^n1, Q^n2·O)
    d_u = jax.lax.dot_general(
        _maybe(cm, compute_dtype), _maybe(kr2, compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype,
    )  # (Q^n1, N)
    d_v = jnp.sum(t3 * g_t[None, :, :], axis=1)  # (Q^n2, N)
    d_views_t = _kr_chain_bwd_t(views_t[:n1], u_prefixes, d_u) + _kr_chain_bwd_t(
        views_t[n1:], v_prefixes, d_v
    )
    d_views = tuple(d.T.reshape(b, hp, wp, in_size) for d in d_views_t)
    return d_cm.reshape(core.shape), d_views


_eps_contract.defvjp(_eps_contract_fwd, _eps_contract_bwd)


@partial(jax.jit, static_argnames=("split", "compute_dtype", "custom_vjp", "backend"))
def eps(
    core: jax.Array,
    x: jax.Array,
    *,
    split: Optional[int] = None,
    compute_dtype=None,
    custom_vjp: bool = True,
    backend: str = "xla",
) -> jax.Array:
    """Contract an EPS ``core`` with all K×K windows of ``x``.

    ``core``: shape (Q,)*(K²·C) + (O,).   ``x``: shape (C, B, H, W, Q).
    Returns (B, H-K+1, W-K+1, O). Matches reference ``eps`` (eps.py:19-40).

    ``compute_dtype``: optionally run the matmul inputs in a lower precision
    (e.g. bfloat16) with float32 accumulation.
    ``custom_vjp``: use the hand-written MXU backward (default; set False to
    fall back to XLA autodiff of the staged forward).
    ``backend``: "xla" (default), "pallas" (fused, differentiable fwd+bwd
    kernels; falls back to xla when the core doesn't fit VMEM), or
    "pallas_interpret" (for CPU tests).
    """
    num_channels, _, _, _, in_size = x.shape
    kernel_size = _infer_kernel_size(core, num_channels)
    n = kernel_size**2 * num_channels
    assert core.shape[:-1] == (in_size,) * n, (core.shape, in_size, n)
    out_size = core.shape[-1]

    n1 = split if split is not None else _balanced_split(n, in_size, out_size)
    n1 = max(1, min(n, n1))
    if backend in ("pallas", "pallas_interpret"):
        from ..pallas.eps_pallas import (
            _resolve_mm_dtype,
            eps_pallas_apply,
            pallas_forward_fits,
        )

        mm_bytes = _resolve_mm_dtype(
            compute_dtype, backend == "pallas_interpret"
        ).itemsize
        if (
            pallas_forward_fits(n, n1, in_size, out_size, mm_bytes=mm_bytes)
            and core.dtype == jnp.float32
            and x.dtype == jnp.float32
        ):
            return eps_pallas_apply(
                core, x, kernel_size, n1,
                interpret=(backend == "pallas_interpret"),
                mm_dtype=compute_dtype,
            )
        # fall through to the XLA path when VMEM would overflow — loudly
        # (a ~5x step-time cliff must never pass unnoticed; VERDICT r3 #6)
        from ..utils import fallbacks

        fallbacks.record(
            f"EPS layer (n={n}, n1={n1}, q={in_size}, o={out_size}, "
            f"dtype={core.dtype}/{x.dtype}) outside the fused Pallas "
            "kernel's VMEM plan or non-f32 — running the XLA path "
            "(~5x slower on TPU; raise DCTN_TPU_VMEM_BUDGET_MB or shrink "
            "the layer/split)"
        )
    views = window_views(x, kernel_size)  # n arrays (B, H', W', Q)
    if custom_vjp:
        return _eps_contract(core, tuple(views), n1, compute_dtype)

    u = khatri_rao(views[:n1])  # (B, H', W', Q^n1)
    acc_dtype = jnp.promote_types(core.dtype, x.dtype)
    cm = core.reshape(in_size**n1, in_size ** (n - n1) * out_size)
    if compute_dtype is not None:
        u = u.astype(compute_dtype)
        cm = cm.astype(compute_dtype)
    t = jax.lax.dot_general(
        u,
        cm,
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )  # (B, H', W', Q^(n-n1)·O)

    if n1 == n:
        return t  # degenerate split: t already is (B, H', W', O)

    v = khatri_rao(views[n1:])  # (B, H', W', Q^(n-n1))
    if compute_dtype is not None:
        v = v.astype(compute_dtype)
    t = t.reshape(*t.shape[:-1], in_size ** (n - n1), out_size)
    out = jnp.sum(v[..., :, None].astype(acc_dtype) * t, axis=-2)
    return out


def eps_one_by_one(core: jax.Array, x: jax.Array) -> jax.Array:
    """Sequentially absorb one window factor at a time (oracle; eps.py:43-63).

    Memory-light but produces K²·C small contractions — used for testing and
    as a fallback for cores too large for the half-split intermediates.
    """
    num_channels, batch, height, width, in_size = x.shape
    kernel_size = _infer_kernel_size(core, num_channels)
    assert core.shape[:-1] == (in_size,) * (kernel_size**2 * num_channels)
    views = window_views(x, kernel_size)
    intermediate = None
    for view in views:
        if intermediate is None:
            # (B,H',W',i) × (i, ...rest, o) -> (B,H',W', ...rest, o)
            intermediate = jnp.tensordot(view, core, axes=([3], [0]))
        else:
            # contract the current leading core dim with the next factor
            intermediate = jnp.einsum("bhwi,bhwi...->bhw...", view, intermediate)
    out_h, out_w = out_spatial(height, width, kernel_size)
    assert intermediate.shape == (batch, out_h, out_w, core.shape[-1])
    return intermediate


# ---------------------------------------------------------------------------
# EPS algebra (used by composition inner products / regularizers)


def contract_on_input_dims(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matricized AᵀB over the shared input dims: (O_a, O_b) (eps.py:106-112)."""
    assert is_eps(a) and is_eps(b)
    return a.reshape(-1, a.shape[-1]).T @ b.reshape(-1, b.shape[-1])


def inner_product(a: jax.Array, b: jax.Array) -> jax.Array:
    """Flattened dot product of two equal-shape EPS cores (eps.py:120-123)."""
    assert a.shape == b.shape and is_eps(a)
    return jnp.dot(a.reshape(-1), b.reshape(-1))


def kron_power(x: jax.Array, k: int) -> jax.Array:
    """k-fold Kronecker power of a matrix, row-major index pairing:
    result[(i₁…i_k), (j₁…j_k)] = ∏ x[i_m, j_m]."""
    s, t = x.shape
    out = jnp.ones((1, 1), x.dtype)
    for _ in range(k):
        out = (out[:, None, :, None] * x[None, :, None, :]).reshape(
            out.shape[0] * s, out.shape[1] * t
        )
    return out


def absorb_on_input_dims(b: jax.Array, x: jax.Array) -> jax.Array:
    """Contract matrix ``x`` (old_in, new_in) into EVERY input dim of EPS ``b``.

    result[j₁…jₙ, o] = Σ_{i₁…iₙ} b[i₁…iₙ, o] ∏ₖ x[iₖ, jₖ]

    TPU-first: instead of n sequential mode-products (each forcing a
    full-tensor transpose, ~6 ms/step in the composition regularizer), group
    the input dims into two halves and apply the Kronecker powers of ``x`` as
    TWO large MXU matmuls — higher nominal FLOPs but transpose-free and an
    order of magnitude faster. Used by the composition inner-product
    recursion (parity: epses_composition.py:49-58).
    """
    assert is_eps(b)
    n = b.ndim - 1
    s, t = x.shape
    o = b.shape[-1]
    n1 = (n + 1) // 2
    n2 = n - n1
    x1 = kron_power(x, n1)  # (s^n1, t^n1)
    m = b.reshape(s**n1, s**n2 * o)
    step1 = jax.lax.dot_general(
        x1, m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.promote_types(b.dtype, x.dtype),
    )  # (t^n1, s^n2·o)
    if n2 == 0:
        return step1.reshape((t,) * n + (o,))
    x2 = kron_power(x, n2)  # (s^n2, t^n2)
    step1 = step1.reshape(t**n1, s**n2, o)
    out = jnp.einsum("abo,bc->aco", step1, x2)
    return out.reshape((t,) * n + (o,))


# ---------------------------------------------------------------------------
# dataset-scale application


def transform_in_slices(
    core: jax.Array, x: jax.Array, batch_size: int = 128, **eps_kwargs
) -> jax.Array:
    """Apply ``eps`` to a whole dataset ``x`` = (C, N, H, W, Q) in batch slices,
    returning (1, N, H', W', O) (parity: eps.py:126-137). No gradients flow
    (wrap in stop_gradient); slices bound device memory for large N."""
    num_channels, n_total, height, width, in_size = x.shape
    pieces = []
    for start in range(0, n_total, batch_size):
        stop = min(start + batch_size, n_total)
        piece = eps(core, jax.lax.stop_gradient(x[:, start:stop]), **eps_kwargs)
        pieces.append(piece)
    return jnp.concatenate(pieces, axis=0)[None]


# ---------------------------------------------------------------------------
# initializers


def make_eps_unit_theoretical_output_std(
    key: jax.Array,
    kernel_size: int,
    in_num_channels: int,
    in_size: int,
    out_size: int,
    dtype=jnp.float32,
) -> jax.Array:
    """randn · (Q^(C·K²))^(-1/2): preserves std through the forward pass if the
    input coordinates have μ²+σ²=1 (parity: eps.py:144-160)."""
    std = total_in_dim_size(kernel_size, in_num_channels, in_size) ** -0.5
    shape = eps_shape(kernel_size, in_num_channels, in_size, out_size)
    return std * jax.random.normal(key, shape, dtype)


def make_eps_unit_empirical_output_std(
    key: jax.Array,
    kernel_size: int,
    out_size: int,
    x: jax.Array,
    dtype=jnp.float32,
    batch_size: int = 128,
) -> jax.Array:
    """Draw a unit-normal core, push the init subset ``x`` (C, N, H, W, Q)
    through it, and rescale the core by 1/std(output) so the empirical output
    std is 1 (parity: eps.py:163-181). Uses biased (population) std like the
    reference's ``std(unbiased=False)``; accumulated in float64 on host across
    slices for stability."""
    num_channels, _, _, _, in_size = x.shape
    shape = eps_shape(kernel_size, num_channels, in_size, out_size)
    core = jax.random.normal(key, shape, dtype)
    # stream population std over slices in f64 on host
    total_n = 0
    total_sum = 0.0
    total_sumsq = 0.0
    n_samples = x.shape[1]
    for start in range(0, n_samples, batch_size):
        stop = min(start + batch_size, n_samples)
        out = eps(core, x[:, start:stop].astype(dtype))
        # accumulate at the run's precision (f64 runs — e.g. the f64 parity
        # suite — must not round the moments through f32), then in Python
        # floats (f64) across slices
        acc = jnp.float64 if out.dtype == jnp.float64 else jnp.float32
        s, ss, cnt = (
            float(jnp.sum(out, dtype=acc)),
            float(jnp.sum(out.astype(acc) ** 2)),
            out.size,
        )
        total_sum += s
        total_sumsq += ss
        total_n += cnt
    mean = total_sum / total_n
    var = total_sumsq / total_n - mean**2
    inv_std = float(var) ** -0.5
    return core * jnp.asarray(inv_std, dtype)
