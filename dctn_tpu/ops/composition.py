"""Algebra on a *composition* (sequence) of EPS cores.

Capability parity: reference ``dctn/epses_composition.py`` — the multi-layer
tensor-network inner product (the composition L2 regularizer), sequential
application to an input, per-layer Frobenius norms, and the three
initialization families (theoretical / empirical unit output std, manually
chosen).

TPU-first notes: the inner-product recursion absorbs the pairwise
input-dim contraction into the next layer with ``absorb_on_input_dims`` — a
chain of mode-product matmuls (MXU) instead of an n+1-operand einsum; all
shapes are static so the whole recursion jits into one fused program.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import eps as eps_mod
from ..utils.misc import (
    OneTensorInit,
    ZeroCenteredNormalInit,
    ZeroCenteredUniformInit,
    FromFileInit,
)


def inner_product(
    epses1: Sequence[jax.Array], epses2: Sequence[jax.Array]
) -> jax.Array:
    """TN inner product of two multi-layer EPS compositions
    (epses_composition.py:21-58). Corresponding cores must share shapes."""
    assert len(epses1) == len(epses2)
    for a, b in zip(epses1, epses2):
        assert a.shape == b.shape and eps_mod.is_eps(a)
    epses1, epses2 = tuple(epses1), tuple(epses2)
    if len(epses1) == 1:
        return eps_mod.inner_product(epses1[0], epses2[0])
    a, b = epses1[:2]
    k = epses2[0]
    x = eps_mod.contract_on_input_dims(a, k)  # (out_a, out_k)
    new_d = eps_mod.absorb_on_input_dims(b, x)
    assert eps_mod.is_eps(new_d)
    return inner_product((new_d,) + epses1[2:], epses2[1:])


def inner_product_cmt(cmts: Sequence[jax.Array], plans) -> jax.Array:
    """``inner_product(epses, epses)`` computed ENTIRELY on the fast (cmt)
    matricized parameter layout — no N-D core is ever materialized.

    Why this exists (measured r3, deep three-EPS config, one v5e chip): XLA
    tiles the last two dims of every array to the (8, 128) vector tile, so a
    tiny-trailing-dim core like the 17-D (2,…,2,4) first layer inflates
    ×~128 in HBM, and the reference-layout recursion's backward materializes
    many such intermediates — the regularizer's gradient alone cost
    3.3 ms/step (23%). Here every intermediate is a 2-D/3-D matrix with
    MXU-friendly minor dims.

    Math: with W_k the layer-k cmt reshaped (O_k, B_k, A_k) (a free
    leading-dim split of its (Z, A) storage) and M_k the (O_k, O_k) Gram
    matrix of the composition truncated at layer k, the recursion is

        M_1[o, o'] = Σ_{b,a} W[o,b,a]·W[o',b,a]
        M_{k+1}    = Σ  W ·(M_k^{⊗n} applied to every input leg of W)·W

    where the Kronecker powers act per half (A legs via one (Z, A)×(A, A)
    MXU matmul, B legs via one 3-D dot_general) — the same two-matmul trick
    as ``absorb_on_input_dims`` but in matricized space. Merged factor
    pairs (q=2 layers) absorb M⊗M per merged leg; kron_power's row-major
    pairing matches the merged index order. The result is
    trace(M_L) = ‖e_1 ∘ … ∘ e_L‖² (parity: reference
    epses_composition.py:21-58; association order differs from
    ``inner_product`` only in f32 roundoff).
    """
    from ..pallas.eps_pallas import _kernel_dims

    M = None
    for W, p in zip(cmts, plans):
        n_k, q_k, n1_k = _kernel_dims(
            p["c"], p["q"], p["kernel_size"], p["n1"], p["merge_pairs"]
        )
        n2_k = n_k - n1_k
        o = p["out_size"]
        a_dim, b_dim = q_k**n1_k, q_k**n2_k
        w3 = W.reshape(o, b_dim, a_dim)
        if M is None:
            ym, y_layout_ab = w3, True
        else:
            m = 2 if p["merge_pairs"] else 1
            k_a = eps_mod.kron_power(M, n1_k * m)  # (A, A), symmetric
            y = jax.lax.dot_general(W, k_a, (((1,), (0,)), ((), ())))
            y3 = y.reshape(o, b_dim, a_dim)
            if n2_k:
                k_b = eps_mod.kron_power(M, n2_k * m)  # (B, B), symmetric
                # (o, A, B'): contracted dim lands last — the final Gram
                # contraction below pairs dims explicitly, no transpose
                ym, y_layout_ab = (
                    jax.lax.dot_general(y3, k_b, (((1,), (0,)), ((), ()))),
                    False,
                )
            else:
                ym, y_layout_ab = y3, True
        dims = ((1, 2), (1, 2)) if y_layout_ab else ((1, 2), (2, 1))
        M = jax.lax.dot_general(w3, ym, (dims, ((), ())))  # (O, O)
    return jnp.trace(M)


def specs_to_full_specs(
    epses_specs: Sequence[Tuple[int, int]], initial_in_size: int
) -> Tuple[Dict[str, int], ...]:
    """Expand (kernel_size, out_size) pairs into full per-layer shape specs
    (epses_composition.py:61-76); each layer's in_size is the previous
    layer's out_size."""
    kernel_sizes = tuple(k for k, _ in epses_specs)
    out_sizes = tuple(o for _, o in epses_specs)
    in_sizes = (initial_in_size,) + out_sizes[:-1]
    return tuple(
        {
            "kernel_size": k,
            "in_num_channels": 1,
            "in_size": i,
            "out_size": o,
        }
        for k, o, i in zip(kernel_sizes, out_sizes, in_sizes)
    )


def contract_with_input(epses: Sequence[jax.Array], x: jax.Array) -> jax.Array:
    """Apply each EPS in sequence; between layers the singleton channel dim is
    re-inserted (epses_composition.py:133-141).

    ``x``: (C, B, H, W, Q) → (B, H_out, W_out, Q_out)."""
    assert all(eps_mod.is_eps(t) for t in epses)
    intermediate = x
    for core in epses[:-1]:
        intermediate = eps_mod.eps(core, intermediate)[None]  # add channel dim
    return eps_mod.eps(epses[-1], intermediate)


def epswise_squared_fro_norm(epses: Sequence[jax.Array]) -> jax.Array:
    """Σ‖core‖²_F over the composition (epses_composition.py:144-146)."""
    assert all(eps_mod.is_eps(t) for t in epses)
    return sum(jnp.sum(core**2) for core in epses)


# ---------------------------------------------------------------------------
# initializers (epses_composition.py:79-130)


def make_unit_theoretical_output_std(
    key: jax.Array,
    epses_specs: Sequence[Tuple[int, int]],
    initial_in_size: int,
    dtype=jnp.float32,
) -> Tuple[jax.Array, ...]:
    full = specs_to_full_specs(epses_specs, initial_in_size)
    keys = jax.random.split(key, len(full))
    return tuple(
        eps_mod.make_eps_unit_theoretical_output_std(k, dtype=dtype, **spec)
        for k, spec in zip(keys, full)
    )


def make_unit_empirical_output_std(
    key: jax.Array,
    epses_specs: Sequence[Tuple[int, int]],
    x: jax.Array,
    dtype=jnp.float32,
    batch_size: int = 128,
) -> Tuple[jax.Array, ...]:
    """Data-dependent init (epses_composition.py:91-105 / SURVEY §3.2): per
    layer, draw a unit-normal core, rescale it so the empirical output std on
    the init subset is 1, then transform the subset with the SCALED core to
    produce the next layer's input. ``x``: (C, N, H, W, Q)."""
    keys = jax.random.split(key, len(epses_specs))
    epses = []
    for k, (kernel_size, out_size) in zip(keys, epses_specs):
        core = eps_mod.make_eps_unit_empirical_output_std(
            k, kernel_size, out_size, x, dtype=dtype, batch_size=batch_size
        )
        x = eps_mod.transform_in_slices(core, x.astype(dtype), batch_size)
        epses.append(core)
    return tuple(epses)


def make_manually_chosen(
    key: jax.Array,
    epses_specs: Sequence[Tuple[int, int]],
    initializations: Sequence[OneTensorInit],
    initial_in_size: int,
    dtype=jnp.float32,
) -> Tuple[jax.Array, ...]:
    """Per-tensor normal / uniform / from-file init
    (epses_composition.py:108-130)."""
    assert len(epses_specs) == len(initializations)
    full = specs_to_full_specs(epses_specs, initial_in_size)
    keys = jax.random.split(key, len(full))
    cores = []
    for k, spec, init in zip(keys, full, initializations):
        shape = eps_mod.eps_shape(**spec)
        if isinstance(init, ZeroCenteredNormalInit):
            core = jax.random.normal(k, shape, dtype) * init.std
        elif isinstance(init, ZeroCenteredUniformInit):
            core = jax.random.uniform(
                k, shape, dtype, minval=-init.maximum, maxval=init.maximum
            )
        elif isinstance(init, FromFileInit):
            import numpy as np

            loaded = jnp.asarray(np.load(init.path), dtype=dtype)
            assert tuple(loaded.shape) == shape, (loaded.shape, shape)
            core = loaded
        else:
            raise ValueError(f"unknown initialization {init!r}")
        cores.append(core)
    return tuple(cores)
