"""EPSesPlusLinear — N EPS layers followed by a linear classifier, pure-JAX.

Capability parity: reference ``dctn/eps_plus_linear.py`` (the current model of
the 90.19% FashionMNIST run): three init families, the custom linear init,
PARAMETER dropout (Bernoulli masks on the EPS core components, scaled 1/p —
not activation dropout), the two L2 regularizers, and intermediate-rep
statistics logging.

TPU-first design: parameters are a plain pytree
``{"epses": (core_0, …), "linear": {"w": (in, 10), "b": (10,)}}``; the forward
is a pure function of (params, x, rng) so it jits/vmaps/shards without any
module machinery, and dropout masks are drawn from an explicit PRNG key.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import logging
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import eps as eps_mod
from ..ops import composition
from ..ops.windows import make_windows
from ..utils.misc import (
    OneTensorInit,
    ZeroCenteredNormalInit,
    ZeroCenteredUniformInit,
)

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EPSesPlusLinearConfig:
    epses_specs: Tuple[Tuple[int, int], ...]  # ((K, Q_out), ...)
    image_size: int = 28
    q0: int = 2
    num_classes: int = 10
    dropout_p: float = 1.0  # probability of KEEPING a core component
    dtype: Any = jnp.float32
    compute_dtype: Optional[Any] = None  # e.g. jnp.bfloat16 for MXU inputs
    eval_backend: str = "xla"  # "pallas": fused forward kernel for inference
    train_backend: str = "xla"  # "pallas": fused fwd+bwd kernels for training
    remat: bool = False  # jax.checkpoint each EPS layer: recompute the
    # Khatri-Rao residuals in backward instead of storing them (trades ~15%
    # step time for O(batch) memory — enables very large batches)

    def __post_init__(self):
        assert 0.0 < self.dropout_p <= 1.0

    @property
    def pre_linear_image_size(self) -> int:
        ks = tuple(k for k, _ in self.epses_specs)
        return self.image_size - sum(ks) + len(ks)

    @property
    def linear_in_features(self) -> int:
        out_q = self.epses_specs[-1][1]
        return self.pre_linear_image_size**2 * out_q


# ---------------------------------------------------------------------------
# initialization


def _init_linear(
    key: jax.Array,
    cfg: EPSesPlusLinearConfig,
    weight_init: Optional[OneTensorInit] = None,
    bias_init: Optional[OneTensorInit] = None,
) -> Dict[str, jax.Array]:
    """Default: w = randn·in^(-1/2)/4, b ~ U(-in^(-1/2), in^(-1/2))
    (eps_plus_linear.py:120-133); or manually chosen distributions."""
    kw, kb = jax.random.split(key)
    n_in, n_out = cfg.linear_in_features, cfg.num_classes
    if weight_init is None:
        w_std = n_in**-0.5 / 4.0
        w = jax.random.normal(kw, (n_in, n_out), cfg.dtype) * w_std
        logger.info("initialized linear.weight as randn * %.30e", w_std)
    elif isinstance(weight_init, ZeroCenteredNormalInit):
        w = jax.random.normal(kw, (n_in, n_out), cfg.dtype) * weight_init.std
    elif isinstance(weight_init, ZeroCenteredUniformInit):
        w = jax.random.uniform(
            kw, (n_in, n_out), cfg.dtype, -weight_init.maximum, weight_init.maximum
        )
    else:
        raise ValueError(f"unsupported linear weight init {weight_init!r}")
    if bias_init is None:
        b_max = n_in**-0.5
        b = jax.random.uniform(kb, (n_out,), cfg.dtype, -b_max, b_max)
        logger.info("initialized linear.bias from U[±%.30e]", b_max)
    elif isinstance(bias_init, ZeroCenteredUniformInit):
        b = jax.random.uniform(
            kb, (n_out,), cfg.dtype, -bias_init.maximum, bias_init.maximum
        )
    elif isinstance(bias_init, ZeroCenteredNormalInit):
        b = jax.random.normal(kb, (n_out,), cfg.dtype) * bias_init.std
    else:
        raise ValueError(f"unsupported linear bias init {bias_init!r}")
    return {"w": w, "b": b}


def init_eps_plus_linear(
    key: jax.Array,
    cfg: EPSesPlusLinearConfig,
    initialization: str = "unit_theoretical_output_std",
    *,
    init_input: Optional[jax.Array] = None,
    init_batch_size: int = 128,
    eps_inits: Optional[Sequence[OneTensorInit]] = None,
    linear_weight_init: Optional[OneTensorInit] = None,
    linear_bias_init: Optional[OneTensorInit] = None,
) -> Params:
    """Build the parameter pytree.

    ``initialization``:
    - "unit_theoretical_output_std": He-like (eps_plus_linear.py:36)
    - "unit_empirical_output_std": data-dependent per-layer rescaling on
      ``init_input`` (C, N, H, W, Q) (eps_plus_linear.py:31, SURVEY §3.2)
    - "manual": per-tensor ``eps_inits`` + linear overrides
      (eps_plus_linear.py:41)
    """
    k_eps, k_lin = jax.random.split(key)
    if initialization == "unit_empirical_output_std":
        assert init_input is not None
        assert init_input.shape[2] == cfg.image_size
        epses = composition.make_unit_empirical_output_std(
            k_eps, cfg.epses_specs, init_input, cfg.dtype, init_batch_size
        )
    elif initialization == "unit_theoretical_output_std":
        epses = composition.make_unit_theoretical_output_std(
            k_eps, cfg.epses_specs, cfg.q0, cfg.dtype
        )
    elif initialization == "manual":
        assert eps_inits is not None
        epses = composition.make_manually_chosen(
            k_eps, cfg.epses_specs, eps_inits, cfg.q0, cfg.dtype
        )
    else:
        raise ValueError(f"unknown initialization {initialization!r}")
    linear = _init_linear(k_lin, cfg, linear_weight_init, linear_bias_init)
    return {"epses": tuple(epses), "linear": linear}


# ---------------------------------------------------------------------------
# forward


def _dropout_epses(
    epses: Tuple[jax.Array, ...], p: float, rng: jax.Array
) -> Tuple[jax.Array, ...]:
    """Bernoulli-mask EPS core COMPONENTS, scaled by 1/p
    (eps_plus_linear.py:139-143)."""
    keys = jax.random.split(rng, len(epses))
    return tuple(
        core * jax.random.bernoulli(k, p, core.shape).astype(core.dtype) / p
        for core, k in zip(epses, keys)
    )


def _pallas_pipeline_forward(
    epses, params, x, cfg, backend, training
) -> Optional[jax.Array]:
    """All-layers-transposed Pallas pipeline: ONE input relayout, then every
    EPS runs in the batch-minor (C, Q, H, W, B) / (O, H', W', B) layout
    (outT[None] IS the next layer's xT — zero relayouts between layers, and
    the batch stays on TPU lanes through every boundary reshape), and the
    linear layer consumes the transposed features via a 2-contracting-dim
    dot_general against the row-reshaped weight. Layer 0 takes the two-pass
    backward so XLA DCEs its (discarded) input-cotangent kernel.

    Returns None when any layer can't run on the Pallas path (caller falls
    back to the generic per-layer dispatch)."""
    from ..pallas.eps_pallas import (
        eps_pallas_apply_t,
        pallas_forward_fits,
        plan_pallas_call,
    )

    interpret = backend == "pallas_interpret"
    # plan every layer first; bail out early if any layer can't.
    # compute_dtype=bfloat16 maps to the kernels' mm_dtype (MXU operand
    # cast, f32 accumulate) — the same semantics the XLA path gives it.
    if x.dtype != jnp.float32:
        return None
    from ..pallas.eps_pallas import _resolve_mm_dtype

    mm_bytes = _resolve_mm_dtype(cfg.compute_dtype, interpret).itemsize
    plans = []
    c, b, h, w, q = x.shape
    for core in epses:
        if core.dtype != jnp.float32:
            return None
        kernel_size = eps_mod._infer_kernel_size(core, c)
        n = kernel_size**2 * c
        out_size = core.shape[-1]
        n1 = eps_mod._balanced_split(n, q, out_size)
        if not pallas_forward_fits(n, n1, q, out_size, mm_bytes=mm_bytes):
            return None
        hp, wp = h - kernel_size + 1, w - kernel_size + 1
        n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
            c, q, kernel_size, n1, out_size, b * hp * wp,
            cfg.compute_dtype, interpret,
        )
        plans.append((kernel_size, n1, bn, merge_pairs, mm_dtype))
        c, q, h, w = 1, out_size, hp, wp

    xT = jnp.transpose(x, (0, 4, 2, 3, 1))  # the ONLY input relayout
    outT = None
    for i, (core, (kernel_size, n1, bn, merge_pairs, mm_dtype)) in enumerate(
        zip(epses, plans)
    ):
        def layer(core_, xT_, _p=(kernel_size, n1, bn, merge_pairs, mm_dtype, i)):
            k_, n1_, bn_, mp_, mm_, i_ = _p
            return eps_pallas_apply_t(
                core_, xT_, k_, n1_, bn_, interpret, mm_, mp_, i_ == 0
            )

        if cfg.remat and training:
            layer = jax.checkpoint(layer)
        outT = layer(core, xT)
        xT = outT[None]
    return _transposed_classifier(outT, params["linear"])


def _transposed_classifier(outT, linear):
    """logits[b, cls] = Σ_{p,o} outT[o,p,b]·W[(p,o),cls] — W rows are ordered
    (h, w, q) row-major (reference layout), no transpose of outT needed: the
    batch-minor (O, H', W', B) features merge their LEADING spatial dims and
    contract batch-free."""
    o, hp2, wp2, b2 = outT.shape
    w_lin = linear["w"].reshape(hp2 * wp2, o, -1)
    logits = jax.lax.dot_general(
        outT.reshape(o, hp2 * wp2, b2),
        w_lin,
        (((0, 1), (1, 0)), ((), ())),
    )
    return logits + linear["b"]


def eps_plus_linear_forward(
    params: Params,
    x: jax.Array,
    cfg: EPSesPlusLinearConfig,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """``x``: (C, B, H, W, Q₀) → logits (B, num_classes)
    (eps_plus_linear.py:138-147)."""
    epses = params["epses"]
    if cfg.dropout_p < 1.0 and training:
        assert rng is not None, "dropout needs an rng key in training mode"
        epses = _dropout_epses(epses, cfg.dropout_p, rng)
    backend = cfg.train_backend if training else cfg.eval_backend
    if backend in ("pallas", "pallas_interpret"):
        out = _pallas_pipeline_forward(epses, params, x, cfg, backend, training)
        if out is not None:
            return out
    apply = partial(eps_mod.eps, compute_dtype=cfg.compute_dtype, backend=backend)
    if cfg.remat and training:
        apply = jax.checkpoint(apply, static_argnums=())
    intermediate = x
    for core in epses:
        intermediate = apply(core, intermediate)[None]
    h = intermediate[0]  # (B, H', W', Q_out)
    flat = h.reshape(h.shape[0], -1)  # b (h w q) — row-major like the reference
    return flat @ params["linear"]["w"] + params["linear"]["b"]


# ---------------------------------------------------------------------------
# fast ("cmt") parameter layout for the Pallas train path
#
# Storing each EPS core as its kernel matrix (Z, A) float32 removes the
# per-step 10-D->matrix transpose + bf16-cast fusion + gradient unpermute --
# measured at ~3.2 ms per flagship step (batch-independent) late-r2 -- and
# lets the optimizer run elementwise on clean 2-D shapes. Conversion happens
# once at init / checkpoint boundaries; checkpoints stay in the REFERENCE
# layout (the params_view pattern).


class FastLayoutUnavailable(ValueError):
    """A layer doesn't fit the Pallas VMEM plan, so the fast (cmt) parameter
    layout (which exists only on the Pallas pipeline) can't be used. A
    dedicated exception — NOT an assert — so the runner's logged fallback to
    the reference layout survives ``python -O``."""


def fast_layer_plans(cfg: EPSesPlusLinearConfig, in_channels: int = 1):
    """Static per-layer plan for the fast layout (batch-size independent):
    (kernel_size, n1, merge_pairs, out_size, core_shape, c, q) per layer.
    Raises FastLayoutUnavailable if any layer can't run on the Pallas
    pipeline (the fast layout exists only there). The fit gate uses the
    RESOLVED mm_dtype's itemsize (bf16-resident cores on the real backend,
    or an explicit ``compute_dtype``), so large-core configs like the
    recorded three-EPS family — whose (K=3, Q_in=4, O=12) layer holds a
    6.3 MB bf16 / 12.6 MB f32 core — are eligible exactly where the kernels
    can actually run them."""
    from ..pallas.eps_pallas import (
        _resolve_mm_dtype,
        pallas_forward_fits,
        plan_pallas_call,
    )

    interpret = cfg.train_backend == "pallas_interpret"
    mm_bytes = _resolve_mm_dtype(cfg.compute_dtype, interpret).itemsize
    c, q = in_channels, cfg.q0
    plans = []
    for kernel_size, out_size in cfg.epses_specs:
        n = kernel_size**2 * c
        n1 = eps_mod._balanced_split(n, q, out_size)
        if not pallas_forward_fits(n, n1, q, out_size, mm_bytes=mm_bytes):
            raise FastLayoutUnavailable(
                f"EPS layer (K={kernel_size}, Q_in={q}, O={out_size}) exceeds "
                "the Pallas VMEM plan — fast (cmt) params require the Pallas "
                "pipeline to cover every layer"
            )
        # nominal npix: bn is batch-dependent and resolved at call time; the
        # n1 / merge_pairs the conversion needs are not
        n1, _bn, merge_pairs, _mm = plan_pallas_call(
            c, q, kernel_size, n1, out_size, 128 * 128, None, False
        )
        plans.append(
            {
                "kernel_size": kernel_size,
                "n1": n1,
                "merge_pairs": merge_pairs,
                "out_size": out_size,
                "core_shape": (q,) * n + (out_size,),
                "c": c,
                "q": q,
            }
        )
        c, q = 1, out_size
    return tuple(plans)


def legacy_split_plans(plans):
    """``plans`` with each layer's n1 replaced by the pre-r3 split rule's
    pick (smallest n1 ≥ ⌈n/2⌉ with q^n1 ≥ 128, nudged even when factor
    pairs merge) — the cmt layout of fast train states saved before the
    MXU-aware split landed; those files carry no ``eps_splits`` tag and the
    runner resumes them through this reconstruction."""
    out = []
    for p in plans:
        n = p["kernel_size"] ** 2 * p["c"]
        q = p["q"]
        n1 = math.ceil(n / 2)
        while q**n1 < 128 and n1 < n:
            n1 += 1
        if p["merge_pairs"] and n1 % 2 == 1:
            n1 += 1 if n1 + 1 <= n else -1
        out.append({**p, "n1": n1})
    return tuple(out)


def saved_t_capped_layers(cfg: EPSesPlusLinearConfig, plans, microbatch: int):
    """Indices of EPS layers whose saved-t backward is disabled only by the
    t-buffer HBM cap at this per-device microbatch size (layer 0 is skipped:
    its backward is always two-pass so its input cotangent DCEs). Non-empty
    ⇒ a smaller microbatch (``--grad-accum-steps``) would re-enable the
    2-matmul backward — the large-batch recipe in docs/performance.md."""
    from ..pallas.eps_pallas import save_t_capped

    h = w = cfg.image_size
    capped = []
    for i, p in enumerate(plans):
        k = p["kernel_size"]
        hp, wp = h - k + 1, w - k + 1
        if i > 0 and save_t_capped(
            p["c"], p["q"], k, p["n1"], p["out_size"],
            microbatch * hp * wp, cfg.compute_dtype,
        ):
            capped.append(i)
        h, w = hp, wp
    return capped


def fast_params_from_reference(
    params: Params, cfg: EPSesPlusLinearConfig, plans=None
):
    """Reference pytree -> (fast_params, plans): each EPS core matricized to
    the kernel's (Z, A) float32 layout. Pass explicit ``plans`` to matricize
    under historical splits (resume of a train state saved before a split-
    rule change — the cmt SHAPE depends on each layer's n1)."""
    from ..pallas.eps_pallas import _core_to_cmt_k, _kernel_dims

    k0 = cfg.epses_specs[0][0]
    in_channels = (params["epses"][0].ndim - 1) // (k0 * k0)
    if plans is None:
        plans = fast_layer_plans(cfg, in_channels)
    cmts = []
    for core, p in zip(params["epses"], plans):
        _, q_k, n1_k = _kernel_dims(
            p["c"], p["q"], p["kernel_size"], p["n1"], p["merge_pairs"]
        )
        cmts.append(_core_to_cmt_k(core, n1_k, q_k))
    return {
        "epses_cmt": tuple(cmts),
        "linear": dict(params["linear"]),
    }, plans


def reference_params_from_fast(fast, cfg: EPSesPlusLinearConfig, plans) -> Params:
    """Inverse of ``fast_params_from_reference`` (exact: pure transposes)."""
    from ..pallas.eps_pallas import _kernel_dims

    cores = []
    for cmt, p in zip(fast["epses_cmt"], plans):
        _, q_k, n1_k = _kernel_dims(
            p["c"], p["q"], p["kernel_size"], p["n1"], p["merge_pairs"]
        )
        shape = p["core_shape"]
        o = shape[-1]
        a = q_k**n1_k
        btot = math.prod(shape[:-1]) // a
        core = (
            jnp.asarray(cmt).reshape(o, btot, a).transpose(2, 1, 0).reshape(shape)
        )
        cores.append(core)
    return {"epses": tuple(cores), "linear": dict(fast["linear"])}


def _dropout_cmts(cmts, plans, p: float, rng: jax.Array):
    """LAYOUT-INVARIANT parameter dropout for the fast (cmt) layout: each
    Bernoulli mask is drawn over the REFERENCE core shape with the exact key
    chain of ``_dropout_epses`` (eps_plus_linear.py:139-143 semantics), then
    permuted into the cmt layout — so the same random bit lands on the same
    logical core component in either layout and fast-layout training with
    p<1 is trajectory-identical to the reference-layout step (the mask
    permutation is a fixed transposition; elementwise optimizers commute
    with the layout permutation)."""
    from ..pallas.eps_pallas import _core_to_cmt_k, _kernel_dims

    keys = jax.random.split(rng, len(cmts))
    out = []
    for cmt, plan, k in zip(cmts, plans, keys):
        mask = jax.random.bernoulli(k, p, plan["core_shape"])
        _, q_k, n1_k = _kernel_dims(
            plan["c"], plan["q"], plan["kernel_size"], plan["n1"],
            plan["merge_pairs"],
        )
        mask_cmt = _core_to_cmt_k(mask, n1_k, q_k).astype(cmt.dtype)
        out.append(cmt * mask_cmt / p)
    return tuple(out)


def eps_plus_linear_forward_fast(
    fast,
    x: jax.Array,
    cfg: EPSesPlusLinearConfig,
    plans,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """The transposed Pallas pipeline over fast (cmt) params. Parameter
    dropout draws reference-order masks and permutes them to cmt
    (``_dropout_cmts``) so p<1 trajectories match the reference layout
    bit-for-bit."""
    from ..pallas.eps_pallas import eps_pallas_apply_t_cmt, plan_pallas_call

    cmts = fast["epses_cmt"]
    if cfg.dropout_p < 1.0 and training:
        assert rng is not None, "dropout needs an rng key in training mode"
        cmts = _dropout_cmts(cmts, plans, cfg.dropout_p, rng)
    backend = cfg.train_backend if training else cfg.eval_backend
    assert backend in ("pallas", "pallas_interpret"), (
        "fast params run only on the Pallas pipeline"
    )
    interpret = backend == "pallas_interpret"
    c0, b, h, w, q0 = x.shape
    xT = jnp.transpose(x, (0, 4, 2, 3, 1))
    ch, qq, hh, ww = c0, q0, h, w
    outT = None
    for i, (cmt, p) in enumerate(zip(cmts, plans)):
        k_, out_size = p["kernel_size"], p["out_size"]
        hp, wp = hh - k_ + 1, ww - k_ + 1
        n1, bn, merge_pairs, mm_dtype = plan_pallas_call(
            ch, qq, k_, p["n1"], out_size, b * hp * wp,
            cfg.compute_dtype, interpret,
        )
        assert n1 == p["n1"] and merge_pairs == p["merge_pairs"]

        def layer(cmt_, xT_, _p=(k_, n1, bn, merge_pairs, mm_dtype, out_size, i)):
            kk, n1_, bn_, mp_, mm_, o_, i_ = _p
            return eps_pallas_apply_t_cmt(
                cmt_, xT_, o_, kk, n1_, bn_, interpret, mm_, mp_, i_ == 0
            )

        if cfg.remat and training:
            layer = jax.checkpoint(layer)
        outT = layer(cmt, xT)
        xT = outT[None]
        ch, qq, hh, ww = 1, out_size, hp, wp
    return _transposed_classifier(outT, fast["linear"])


# ---------------------------------------------------------------------------
# regularizers (eps_plus_linear.py:149-159)


def epswise_l2_regularizer(params: Params) -> jax.Array:
    return jnp.sum(params["linear"]["w"] ** 2) + composition.epswise_squared_fro_norm(
        params["epses"]
    )


def epses_composition_l2_regularizer(params: Params) -> jax.Array:
    return jnp.sum(params["linear"]["w"] ** 2) + composition.inner_product(
        params["epses"], params["epses"]
    )


# ---------------------------------------------------------------------------
# intermediate representation statistics (eps_plus_linear.py:161-196)


def intermediate_reps_stats(
    params: Params,
    x: jax.Array,
    cfg: EPSesPlusLinearConfig,
    batch_size: int = 128,
) -> Dict[str, Dict[str, float]]:
    """Statistics (μ, σ, μ²+σ²) of every intermediate representation x_n, of
    the window rank-one batches w_n, and of the linear layer's output, as if
    training were off. Returns a dict and logs each line."""
    stats: Dict[str, Dict[str, float]] = {}

    def one(name: str, mu: float, sigma: float, extra: str = "") -> None:
        stats[name] = {"mean": mu, "std": sigma, "second_moment": mu**2 + sigma**2}
        logger.info(
            "%s: μ=%.7e, σ=%.7e, μ²+σ²=%.7e%s", name, mu, sigma, mu**2 + sigma**2, extra
        )

    for n, core in enumerate(params["epses"]):
        mu = float(jnp.mean(x))
        sigma = float(jnp.std(x))
        one(f"x_{n}", mu, sigma, f", shape={tuple(x.shape)}")
        kernel_size = math.isqrt(core.ndim - 1)
        w = make_windows(x, kernel_size)
        one(
            f"w_{n}",
            float(w.mean_over_batch()),
            float(w.std_over_batch(unbiased=False)),
        )
        x = eps_mod.transform_in_slices(core, x, batch_size)
    flat = x[0].reshape(x.shape[1], -1)
    one(f"x_{len(params['epses'])}", float(jnp.mean(flat)), float(jnp.std(flat)))
    no_bias = flat @ params["linear"]["w"]
    one(
        "output_of_linear_without_bias",
        float(jnp.mean(no_bias)),
        float(jnp.std(no_bias)),
    )
    with_bias = no_bias + params["linear"]["b"]
    one(
        "output_of_linear_with_bias",
        float(jnp.mean(with_bias)),
        float(jnp.std(with_bias)),
    )
    return stats
