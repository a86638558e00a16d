"""Fused Pallas TPU kernel for the EPS forward pass.

One pass per pixel tile: both Khatri-Rao halves are built in VMEM in
transposed (features, bn) layout (leading-dim merges — Mosaic cannot merge
tiny trailing dims), the core matmul runs on the MXU against the
VMEM-resident matricized core, and the v-contraction is fused — u, v and t
never touch HBM (the XLA path materializes all three).

Used for inference/eval paths (scoring, dataset transforms, empirical init
forwards). Training keeps the XLA custom-VJP path: its backward needs the
chain prefixes and t as residuals, and recomputing them would cost more than
the forward fusion saves (measured). A fully fused backward kernel is the
round-2 item noted in PARITY.md.

Capability note: this is the TPU-native analog of the reference's hand-chosen
opt_einsum contraction path (eps.py:25-40) taken one level further down.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep the resident core + per-tile working set inside VMEM (16 MB hardware;
# the two-EPS flagship's layer 2 measures ~12 MB at bn=256 and compiles fine)
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _kernel_factory(n: int, n1: int, q: int, o: int, bn: int):
    n2 = n - n1

    def kernel(views_ref, cmt_ref, out_ref):
        # views_ref: (n, q, bn); cmt_ref: (Z, A); out_ref: (o, bn)
        u = views_ref[0]
        for k in range(1, n1):
            f = views_ref[k]
            u = (u[:, None, :] * f[None, :, :]).reshape(-1, u.shape[-1])
        t = jnp.dot(cmt_ref[:], u, preferred_element_type=jnp.float32)  # (Z, bn)
        if n2 > 0:
            v = views_ref[n1]
            for k in range(n1 + 1, n):
                f = views_ref[k]
                v = (v[:, None, :] * f[None, :, :]).reshape(-1, v.shape[-1])
            t3 = t.reshape(q**n2, o, bn)
            out = jnp.sum(v[:, None, :] * t3, axis=0)
        else:
            out = t
        out_ref[:] = out

    return kernel


def pallas_forward_fits(n: int, n1: int, q: int, o: int, bn: int = 256) -> bool:
    """Whether the matricized core + tile working set fit the VMEM budget."""
    a, z = q**n1, q ** (n - n1) * o
    per_tile = 4 * bn * (2 * a + 2 * z + n * q + o)  # prefixes + t + views + out
    return 4 * a * z + per_tile < _VMEM_BUDGET_BYTES


@partial(jax.jit, static_argnames=("n1", "out_size", "bn", "interpret"))
def _run(views_t, cmt, n1, out_size, bn, interpret):
    n, q, npix = views_t.shape
    npad = -(-npix // bn) * bn
    if npad != npix:
        views_t = jnp.pad(views_t, ((0, 0), (0, 0), (0, npad - npix)))
    out = pl.pallas_call(
        _kernel_factory(n, n1, q, out_size, bn),
        out_shape=jax.ShapeDtypeStruct((out_size, npad), jnp.float32),
        grid=(npad // bn,),
        in_specs=[
            pl.BlockSpec((n, q, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(cmt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_size, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(views_t, cmt)
    return out[:, :npix]


def eps_pallas_forward(
    core: jax.Array,
    views,
    n1: int,
    bn: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused forward over pre-extracted window ``views`` (n arrays of
    (B, H', W', Q)); returns (B, H', W', O)."""
    n = len(views)
    in_size = views[0].shape[-1]
    out_size = core.shape[-1]
    b, hp, wp, _ = views[0].shape
    npix = b * hp * wp
    views_t = jnp.stack([v.reshape(npix, in_size).T for v in views], axis=0)
    cmt = core.reshape(in_size**n1, in_size ** (n - n1) * out_size).T
    out_t = _run(views_t, cmt, n1, out_size, bn, interpret)
    return out_t.T.reshape(b, hp, wp, out_size)
