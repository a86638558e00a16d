"""Empirical on-device autotuning of the fast-layout matmul split (n1).

Each EPS layer's Pallas kernels stage the window contraction as
``u(Q^n1) @ cmt`` — the split n1 fixes the MXU contracting dim, the VPU
Khatri-Rao chain lengths, AND the stored (Z, A) cmt parameter shape.
``ops.eps._balanced_split`` picks n1 from an analytic cost model; the model
has been measured wrong before (r3: it inherited a (K=2, Q=12, O=24) layer
at a=144 — MXU-padded to 256, 60.6 TF/s — from the earlier rule; the fix
tripled that layer's arithmetic intensity). A model is still a model:
``autotune_splits`` replaces the ranking with MEASUREMENT — the top
candidates are compiled and timed as jitted fwd+bwd programs on the actual
device at the actual pixel count, and the fastest becomes the plan.

Why this is safe to flip per run: split changes are mathematically exact
(the cmt layout is a bijective matricization of the same core —
tests/test_fast_layout.py pins trajectory equality across splits), train
states tag their splits (``eps_splits``), and the runner auto-converts on
resume. So tuned runs interoperate with default runs and old checkpoints.

Measurement rules (docs/performance.md): each candidate is timed with
fenced value-fetch windows auto-extended to ≥1 s of device time
(utils/benchmark._timed_window), so the fixed ~28 ms per-window relay cost
and the async-dispatch pipeline cannot skew the ranking.

No reference analog: the reference caches opt_einsum contraction paths
(``dctn/contraction_path_cache.py``) but never measures alternatives; on
TPU the measured ranking is the standard way hot-kernel parameters are
chosen (XLA's own autotuner does the same for GEMM tilings).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops import eps as eps_mod
from ..utils.benchmark import _timed_window

# Bump when a kernel/planner change invalidates previously measured
# rankings (cached entries with another schema are ignored, not errors).
_CACHE_SCHEMA = 1


def default_cache_path() -> str:
    """Where measured picks persist across runs: the env override, else
    ``~/.cache/dctn_tpu/autotune.json``. Sweep workers tuning the same
    architecture (cli/sweep.py fans out one process per config) hit the
    cache after the first worker pays the compile+measure cost."""
    env = os.environ.get("DCTN_TPU_AUTOTUNE_CACHE")
    if env:
        return env
    return os.path.join(
        os.path.expanduser("~"), ".cache", "dctn_tpu", "autotune.json"
    )


def _cache_key(
    cfg, batch_size, in_channels, *, max_candidates, charge_reg, reg_type,
    min_gain, forward_only, quantize, interpret,
) -> str:
    """Everything that can change a measured ranking or the pick rule:
    the layer-shape chain, the microbatch (pixel count sets bn and the
    saved-t decision), the objective, the device kind, and the VMEM/saved-t
    planning env knobs."""
    device = "interpret" if interpret else jax.devices()[0].device_kind
    key = {
        "schema": _CACHE_SCHEMA,
        "device_kind": device,
        "epses_specs": [list(s) for s in cfg.epses_specs],
        "image_size": cfg.image_size,
        "q0": cfg.q0,
        "in_channels": in_channels,
        "batch_size": batch_size,
        "compute_dtype": (
            None
            if cfg.compute_dtype is None
            else jnp.dtype(cfg.compute_dtype).name
        ),
        "objective": (
            f"serve-{quantize or 'f32'}"
            if forward_only
            # "train" (not "train-f32") keeps pre-QAT cache entries valid
            else ("train" if quantize is None else f"train-{quantize}")
        ),
        "reg": reg_type if charge_reg else None,
        "max_candidates": max_candidates,
        "min_gain": min_gain,
        "vmem_budget_mb": os.environ.get("DCTN_TPU_VMEM_BUDGET_MB", "56"),
        "save_t_min_a": os.environ.get("DCTN_TPU_SAVE_T_MIN_A", "512"),
        "save_t_max_bytes": os.environ.get(
            "DCTN_TPU_SAVE_T_MAX_BYTES", str(4 << 30)
        ),
    }
    return json.dumps(key, sort_keys=True)


def _cache_load(path: str) -> dict:
    try:
        with open(path) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}  # absent or corrupted: a miss, never an error


def _cache_store(path: str, key: str, entry: dict) -> None:
    """Read-merge-replace so concurrent sweep workers at worst lose one
    entry, never corrupt the file (os.replace is atomic)."""
    try:
        data = _cache_load(path)
        data[key] = entry
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, path)
    except OSError:
        pass  # read-only cache dir etc. — caching is best-effort


def _layer_dims(cfg, in_channels: int = 1):
    """Per-layer (c, q, h, w, kernel_size, out_size) chain — independent of
    any split choice, so layers tune independently."""
    c, q, h, w = in_channels, cfg.q0, cfg.image_size, cfg.image_size
    dims = []
    for kernel_size, out_size in cfg.epses_specs:
        dims.append((c, q, h, w, kernel_size, out_size))
        h, w = h - kernel_size + 1, w - kernel_size + 1
        c, q = 1, out_size
    return dims


def candidate_splits(
    n: int, q: int, out_size: int, mm_bytes: int, max_candidates: int
) -> list:
    """Feasible splits ranked by the analytic cost model, truncated to the
    ``max_candidates`` cheapest (the model is trusted to rank the tail —
    only the head is worth compile time)."""
    from ..pallas.eps_pallas import pallas_forward_fits

    legal = [
        n1
        for n1 in eps_mod.split_candidates(n, q)
        if pallas_forward_fits(n, n1, q, out_size, mm_bytes=mm_bytes)
    ]
    legal.sort(key=lambda n1: (eps_mod._split_cost(n, q, out_size, n1), n1))
    return legal[:max_candidates]


def _measure_candidate(
    c, q, h, w, kernel_size, out_size, n1, batch_size, compute_dtype,
    interpret, is_first_layer, key, forward_only=False, quantize=None,
):
    """fwd+bwd (or fwd-only for serving) ms/step of one layer at one split,
    synthetic operands (no data-dependent control flow in the kernels —
    values cannot change the timing, only shapes do). ``quantize="int8"``
    times the W8A8 kernels instead: the serving kernel with
    ``forward_only``, the QAT (STE) training step without — the int8 MXU
    halves the matmul time, so the split that balances matmul against the
    VPU chain work can differ from the f32 pick."""
    from ..pallas.eps_pallas import (
        _kernel_dims,
        eps_pallas_apply_t_cmt,
        plan_pallas_call,
    )

    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    npix = batch_size * hp * wp
    n1_r, bn, merge_pairs, mm_dtype = plan_pallas_call(
        c, q, kernel_size, n1, out_size, npix, compute_dtype, interpret
    )
    assert n1_r == n1  # candidates respect merge evenness by construction
    n_k, q_k, n1_k = _kernel_dims(c, q, kernel_size, n1, merge_pairs)
    a = q_k**n1_k
    z = out_size * q_k ** (n_k - n1_k)
    k1, k2 = jax.random.split(key)
    cmt = jax.random.normal(k1, (z, a), jnp.float32) * a**-0.5
    xT = jax.random.uniform(k2, (c, q, h, w, batch_size), jnp.float32)

    if quantize == "int8" and forward_only:
        from ..pallas.eps_pallas_q8 import (
            eps_pallas_apply_t_q8,
            plan_q8_bn,
            quantize_cmt,
        )

        wq, sw = quantize_cmt(cmt)
        bn_q = plan_q8_bn(
            n_k, n1_k, q_k, out_size, max(128, -(-npix // 128) * 128)
        )
        if bn_q is None:
            raise ValueError(
                f"split n1={n1} does not fit the q8 kernel's VMEM budget"
            )

        def loss(cmt_, xT_):
            return jnp.sum(
                eps_pallas_apply_t_q8(
                    wq, sw, xT_, out_size, kernel_size, n1, bn_q, interpret,
                    merge_pairs,
                )
            )

    elif quantize == "int8":
        # QAT TRAINING objective (--qat int8 --autotune-splits): time the
        # W8A8 STE step — the quantized forward plus the f32/bf16 backward
        # — so the pick optimizes the kernels the run actually executes
        # (same bn/bn_q8/saved-t planning as apply_q8train_layer)
        from ..pallas.eps_pallas_q8 import (
            eps_pallas_apply_t_cmt_q8train,
            plan_q8_train_bn,
            qat_save_decision,
        )

        cap = max(128, -(-npix // 128) * 128)
        will_save = qat_save_decision(
            c, q, kernel_size, n1, out_size, npix, compute_dtype, interpret,
            is_first_layer,
        )
        bn_q8 = plan_q8_train_bn(
            n_k, n1_k, q_k, out_size, cap, will_save,
            jnp.dtype(mm_dtype).itemsize,
        )
        if bn_q8 is None:
            raise ValueError(
                f"split n1={n1} does not fit the q8 training kernel's "
                "VMEM budget"
            )

        def loss(cmt_, xT_):
            return jnp.sum(
                eps_pallas_apply_t_cmt_q8train(
                    cmt_, xT_, out_size, kernel_size, n1, bn, bn_q8,
                    interpret, mm_dtype, merge_pairs, is_first_layer,
                    will_save,
                )
            )

    else:
        args = (
            out_size, kernel_size, n1, bn, interpret, mm_dtype, merge_pairs,
            is_first_layer,
        )

        def loss(cmt_, xT_):
            return jnp.sum(eps_pallas_apply_t_cmt(cmt_, xT_, *args))

    if forward_only:  # serving objective: inference has no backward
        fwd = jax.jit(loss)
        box = {}

        def call():
            box["v"] = fwd(cmt, xT)
            return box["v"]

    else:
        # differentiate w.r.t. the INPUT too for non-first layers: with
        # argnums=0 alone XLA dead-code-eliminates the separate d_views
        # pallas_call on the two-pass/two_t backward arms (the production
        # step relies on exactly that DCE — but only for layer 0), so those
        # candidates would time without a pass training actually pays for
        argnums = 0 if is_first_layer else (0, 1)
        step = jax.jit(jax.value_and_grad(loss, argnums=argnums))
        box = {}

        def call():
            box["v"], box["g"] = step(cmt, xT)
            return box["v"]

    call()  # compile
    float(box["v"])  # fence the warmup
    if interpret:  # CPU tests: the ranking is meaningless — one raw window
        t0 = time.perf_counter()
        for _ in range(2):
            call()
        float(box["v"])
        return (time.perf_counter() - t0) / 2 * 1e3
    iters, best = 32, float("inf")
    for _ in range(2):
        s_per_iter, iters = _timed_window(call, iters)
        best = min(best, s_per_iter)
    return best * 1e3


def _measure_reg_marginal(cfg, plans, layer: int, n1: int, interpret, key):
    """fwd+bwd ms of the composition regularizer with layer ``layer``'s
    split set to ``n1`` (defaults elsewhere). The epses_composition
    recursion absorbs Kronecker powers of the inter-layer Gram matrix whose
    size is q^(2·n1·m) — the regularizer's cost COUPLES to the kernel split
    (measured: an n1 one step larger on the deep config's K=3 layer made
    the kron matrix 64 MB and DOUBLED the full step), so candidates must be
    charged for it. Cross-layer terms don't depend on this layer's split
    (the recursion passes (O, O) Gram VALUES between layers), so the
    per-layer marginal is the right charge for a per-layer argmin."""
    from ..ops.composition import inner_product_cmt
    from ..pallas.eps_pallas import _kernel_dims

    trial = tuple(
        {**p, "n1": n1} if j == layer else p for j, p in enumerate(plans)
    )
    cmts = []
    for p in trial:
        n_k, q_k, n1_k = _kernel_dims(
            p["c"], p["q"], p["kernel_size"], p["n1"], p["merge_pairs"]
        )
        a = q_k**n1_k
        key, sub = jax.random.split(key)
        cmts.append(
            jax.random.normal(
                sub, (p["out_size"] * q_k ** (n_k - n1_k), a), jnp.float32
            )
            * a**-0.5
        )
    cmts = tuple(cmts)
    fn = jax.jit(jax.value_and_grad(lambda cs: inner_product_cmt(cs, trial)))
    box = {}

    def call():
        box["v"], box["g"] = fn(cmts)
        return box["v"]

    call()
    float(box["v"])
    if interpret:
        t0 = time.perf_counter()
        for _ in range(2):
            call()
        float(box["v"])
        return (time.perf_counter() - t0) / 2 * 1e3
    iters, best = 64, float("inf")
    for _ in range(2):
        s_per_iter, iters = _timed_window(call, iters)
        best = min(best, s_per_iter)
    return best * 1e3


def _cached_plans(cache_path, ckey, base_plans, mm_bytes, max_candidates, log):
    """Cache lookup shared by autotune_splits and the lookup-only path:
    returns (plans, report) on a legal hit, else None."""
    hit = _cache_load(cache_path).get(ckey)
    if hit is None:
        return None
    picks = hit.get("picks", [])
    legal = len(picks) == len(base_plans) and all(
        n1
        in candidate_splits(
            p["kernel_size"] ** 2 * p["c"], p["q"], p["out_size"],
            mm_bytes, max_candidates,
        )
        for n1, p in zip(picks, base_plans)
    )
    if legal:
        log(
            f"autotune cache hit ({cache_path}): splits "
            f"{tuple(picks)} reused without re-measuring"
        )
        report = [{**r, "cached": True} for r in hit.get("report", [])]
        return (
            tuple({**p, "n1": n1} for p, n1 in zip(base_plans, picks)),
            report,
        )
    log(
        f"autotune cache entry at {cache_path} no longer legal "
        "(planner change?) — re-measuring"
    )
    return None


def autotune_cache_lookup(
    cfg,
    batch_size: int,
    in_channels: int = 1,
    *,
    max_candidates: int = 3,
    reg_type: str = "epswise",
    reg_coeff: float = 0.0,
    min_gain: float = 0.02,
    forward_only: bool = False,
    quantize: Optional[str] = None,
    log_fn: Optional[Callable[[str], None]] = None,
    cache_path: Optional[str] = None,
):
    """LOOKUP-ONLY twin of ``autotune_splits``: returns (plans, report) when
    the persistent cache already holds measured picks for this exact tuning
    problem, else None — never compiles or measures anything. The runner
    uses it so a config that was ever tuned gets its tuned splits BY
    DEFAULT (VERDICT r3 weak #7): splits are exact, so applying a cached
    pick is a pure performance win with zero startup cost."""
    if not cache_path:
        return None
    from ..models.eps_plus_linear import fast_layer_plans
    from ..pallas.eps_pallas import _resolve_mm_dtype

    log = log_fn or (lambda s: None)
    interpret = cfg.train_backend == "pallas_interpret"
    base_plans = fast_layer_plans(cfg, in_channels)
    mm_bytes = _resolve_mm_dtype(cfg.compute_dtype, interpret).itemsize
    charge_reg = (
        reg_type == "epses_composition"
        and reg_coeff != 0.0
        and not forward_only
    )
    ckey = _cache_key(
        cfg, batch_size, in_channels, max_candidates=max_candidates,
        charge_reg=charge_reg, reg_type=reg_type, min_gain=min_gain,
        forward_only=forward_only, quantize=quantize, interpret=interpret,
    )
    return _cached_plans(
        cache_path, ckey, base_plans, mm_bytes, max_candidates, log
    )


def autotune_splits(
    cfg,
    batch_size: int,
    in_channels: int = 1,
    *,
    max_candidates: int = 3,
    reg_type: str = "epswise",
    reg_coeff: float = 0.0,
    min_gain: float = 0.02,
    forward_only: bool = False,
    quantize: Optional[str] = None,
    log_fn: Optional[Callable[[str], None]] = None,
    seed: int = 0,
    cache_path: Optional[str] = None,
):
    """Measure-and-pick n1 per EPS layer. Returns (plans, report): ``plans``
    in the ``fast_layer_plans`` format with each layer's n1 replaced by the
    measured winner, ``report`` one dict per layer with all candidate
    timings. ``batch_size`` is the PER-DEVICE microbatch the step will run
    (grad-accum/mesh-sharded runs should pass the sharded size — the pixel
    count changes bn and the saved-t decision, hence possibly the winner).

    ``forward_only=True`` tunes the SERVING objective instead (inference
    forward, no backward, no regularizer) — used by the export CLI to pick
    splits for baked artifacts; training and serving can prefer different
    splits since the backward's pass shapes dominate the training pick.
    ``quantize="int8"`` times the W8A8 kernels instead of the f32 ones —
    with ``forward_only`` the serving kernel the artifact will run, without
    it the QAT (STE) training step behind the runner's ``--qat int8``. The
    int8 MXU matmul is ~2× the f32 rate, which can shift the optimal
    matmul/VPU-chain balance (measured for serving: the flagship's f32 pick
    is (10, 6) but its int8 kernels are fastest at (8, 5)); a candidate
    that does not fit the q8 VMEM plan is skipped like any other failed
    candidate.

    When the run trains with the epses_composition regularizer, each
    candidate is charged its marginal regularizer cost too (see
    ``_measure_reg_marginal`` — the split-coupled kron sizes there can
    dwarf a kernel-side win).

    ``cache_path``: persist measured picks to this JSON file and reuse them
    when the SAME tuning problem recurs (key: ``_cache_key`` — layer-shape
    chain, microbatch, objective, device kind, planning env knobs). Splits
    are exact either way, so a stale entry can only cost performance, never
    correctness; delete the file (or bump ``_CACHE_SCHEMA``) to re-measure.
    ``default_cache_path()`` gives the conventional location (the runner and
    export CLIs pass it unless ``--no-autotune-cache``).

    Raises FastLayoutUnavailable (from fast_layer_plans) if the model has no
    fast layout to tune.
    """
    from ..models.eps_plus_linear import fast_layer_plans
    from ..pallas.eps_pallas import _resolve_mm_dtype

    log = log_fn or (lambda s: None)
    interpret = cfg.train_backend == "pallas_interpret"
    base_plans = fast_layer_plans(cfg, in_channels)
    mm_bytes = _resolve_mm_dtype(cfg.compute_dtype, interpret).itemsize
    charge_reg = (
        reg_type == "epses_composition"
        and reg_coeff != 0.0
        and not forward_only  # serving has no regularizer
    )
    ckey = None
    if cache_path:
        ckey = _cache_key(
            cfg, batch_size, in_channels, max_candidates=max_candidates,
            charge_reg=charge_reg, reg_type=reg_type, min_gain=min_gain,
            forward_only=forward_only, quantize=quantize,
            interpret=interpret,
        )
        hit = _cached_plans(cache_path, ckey, base_plans, mm_bytes,
                            max_candidates, log)
        if hit is not None:
            return hit
    key = jax.random.PRNGKey(seed)
    plans, report = [], []
    for i, ((c, q, h, w, kernel_size, out_size), base) in enumerate(
        zip(_layer_dims(cfg, in_channels), base_plans)
    ):
        n = kernel_size**2 * c
        cands = candidate_splits(n, q, out_size, mm_bytes, max_candidates)
        assert base["n1"] in cands, (base["n1"], cands)  # model pick is rank-1
        rows = []
        for n1 in cands:
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            try:
                ms = _measure_candidate(
                    c, q, h, w, kernel_size, out_size, n1, batch_size,
                    cfg.compute_dtype, interpret, i == 0, sub,
                    forward_only=forward_only, quantize=quantize,
                )
                row = {"n1": n1, "ms": ms}
                if charge_reg:
                    key, sub = jax.random.split(key)
                    row["reg_ms"] = _measure_reg_marginal(
                        cfg, base_plans, i, n1, interpret, sub
                    )
                    row["ms"] = ms + row["reg_ms"]
                    row["kernel_ms"] = ms
            except Exception as e:  # infeasible candidate (e.g. a split
                # whose composition-reg kron intermediate exceeds HBM —
                # measured: L2 of the deep config at n1=4 wants an 18 GB
                # reshape). The default plan compiling is the runner's
                # precondition, so losing non-default candidates is safe.
                if n1 == base["n1"]:
                    raise
                row = {"n1": n1, "failed": type(e).__name__}
                log(
                    f"autotune L{i} n1={n1}: candidate failed to "
                    f"compile/run ({type(e).__name__}) — skipped"
                )
                from ..utils import fallbacks

                fallbacks.record(
                    f"autotune layer {i}: split candidate n1={n1} failed "
                    f"to compile/run ({type(e).__name__}) — skipped (the "
                    "winner was chosen among the remaining candidates)"
                )
                rows.append(row)
                continue
            rows.append(row)
            log(
                f"autotune L{i} (K={kernel_size}, Q={q}->O={out_size}) "
                f"n1={n1}: {row['ms']:.3f} ms "
                + (("fwd-q8" if quantize == "int8" else "fwd")
                   if forward_only else "fwd+bwd")
                + (f" (reg {row['reg_ms']:.3f})" if charge_reg else "")
                + f" (compile+measure {time.perf_counter() - t0:.0f}s)"
            )
        ok_rows = [r for r in rows if "ms" in r]
        winner = min(ok_rows, key=lambda r: r["ms"])
        default_row = next(r for r in ok_rows if r["n1"] == base["n1"])
        if (
            winner["n1"] != base["n1"]
            and default_row["ms"] / winner["ms"] < 1.0 + min_gain
        ):
            # within the noise margin: keep the model pick — deviating
            # changes the stored cmt layout (resume conversion churn) for
            # no demonstrated benefit (observed run-to-run spread on
            # sub-ms layers is a few %)
            log(
                f"autotune L{i}: n1={winner['n1']} only "
                f"{default_row['ms'] / winner['ms']:.3f}x over the model "
                f"pick (< {1 + min_gain:.2f}x margin) — keeping "
                f"n1={base['n1']}"
            )
            winner = default_row
        log(
            f"autotune L{i}: picked n1={winner['n1']} "
            f"(model pick {base['n1']}"
            + (
                ")"
                if winner["n1"] == base["n1"]
                else f", {default_row['ms'] / winner['ms']:.2f}x over model pick)"
            )
        )
        plans.append({**base, "n1": winner["n1"]})
        report.append(
            {
                "layer": i,
                "kernel_size": kernel_size,
                "q": q,
                "out_size": out_size,
                "candidates": rows,
                "picked_n1": winner["n1"],
                "model_n1": base["n1"],
            }
        )
    if cache_path:
        _cache_store(
            cache_path,
            ckey,
            {
                "picks": [p["n1"] for p in plans],
                "report": report,
                "saved_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            },
        )
    return tuple(plans), report


# ---------------------------------------------------------------------------
# measured --grad-accum-steps auto — VERDICT r4 #5.


def autotune_grad_accum(
    cfg,
    plans,
    per_device_batch: int,
    in_channels: int = 1,
    *,
    cap_pick: int,
    max_extra: int = 2,
    log_fn: Optional[Callable[[str], None]] = None,
    seed: int = 0,
    cache_path: Optional[str] = None,
) -> int:
    """Measure-based refinement of the cap-model grad-accum pick. The cap
    model (`saved_t_capped_layers`) finds the smallest accumulation at which
    no layer's saved-t backward is HBM-capped — but the smallest
    cap-satisfying value is not always the fastest (measured: deep-3 at
    bs 2048 caps at 2 → 12.62k img/s while accum 4 runs 12.84k). When the
    cap fired (``cap_pick > 1``), time the candidate accum values
    ``cap_pick · 2^k`` (k ≤ max_extra) as the REAL assembled fast train
    step (``make_fast_train_step`` with that ``grad_accum_steps`` — the
    exact program the runner will execute, scan overheads included; a
    per-layer-sum proxy was tried first and could NOT resolve the ~2%
    full-step differences it must rank — grad_accum_auto_probe r5).
    Returns the measured winner. ``cap_pick == 1`` (nothing capped)
    short-circuits: plain steps measured faster than any accumulation
    whenever saved-t fits. Multi-channel configs (``in_channels > 1``)
    keep the cap-model pick (the synthetic-init full-step path is
    single-channel).
    """
    log = log_fn or (lambda s: None)
    if cap_pick <= 1 or plans is None or in_channels != 1:
        return max(1, cap_pick)
    interpret = cfg.train_backend == "pallas_interpret"
    cands = []
    s = cap_pick
    while s <= per_device_batch and len(cands) < 1 + max_extra:
        if per_device_batch % s == 0:
            cands.append(s)
        s *= 2
    if len(cands) <= 1:
        return cap_pick
    ckey = None
    if cache_path:
        base_key = json.loads(
            _cache_key(
                cfg, per_device_batch, in_channels, max_candidates=0,
                charge_reg=False, reg_type="", min_gain=0.0,
                forward_only=False, quantize=None, interpret=interpret,
            )
        )
        base_key["family"] = "grad_accum"
        base_key["cap_pick"] = cap_pick
        base_key["splits"] = [p["n1"] for p in plans]
        ckey = json.dumps(base_key, sort_keys=True)
        hit = _cache_load(cache_path).get(ckey)
        if hit is not None and hit.get("pick") in cands:
            log(
                f"grad-accum autotune cache hit: {hit['pick']} "
                "(measured earlier)"
            )
            return int(hit["pick"])
    import optax

    from ..models.eps_plus_linear import (
        fast_params_from_reference,
        init_eps_plus_linear,
    )
    from .step import make_fast_train_step

    key = jax.random.PRNGKey(seed)
    params = init_eps_plus_linear(key, cfg)
    fast, _ = fast_params_from_reference(params, cfg, plans=plans)
    opt = optax.sgd(1e-3)  # candidate-independent; smallest program
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(
        k1, (1, per_device_batch, cfg.image_size, cfg.image_size, cfg.q0),
        jnp.float32,
    )
    y = jax.random.randint(k2, (per_device_batch,), 0, 10)
    best_s, best_ms, rows = cap_pick, float("inf"), []
    for s in cands:
        t0 = time.perf_counter()
        try:
            step = make_fast_train_step(
                cfg, opt, plans, "epswise", 1e-6, donate=False,
                grad_accum_steps=s,
            )
            p_s = fast
            o_s = opt.init(fast)
            box = {}

            def call():
                nonlocal p_s, o_s
                p_s, o_s, box["m"] = step(
                    p_s, o_s, jax.random.PRNGKey(3), x, y
                )
                return box["m"]["loss"]

            call()
            float(box["m"]["loss"])  # fence the warmup/compile
            if interpret:
                t1 = time.perf_counter()
                for _ in range(2):
                    call()
                float(box["m"]["loss"])
                step_ms = (time.perf_counter() - t1) / 2 * 1e3
            else:
                iters, best = 8, float("inf")
                for _ in range(2):
                    s_per_iter, iters = _timed_window(
                        lambda: call(), iters
                    )
                    best = min(best, s_per_iter)
                step_ms = best * 1e3
        except Exception as e:  # a microbatch that fails to plan/compile
            log(
                f"grad-accum autotune: accum {s} (microbatch "
                f"{per_device_batch // s}) failed ({type(e).__name__}) — "
                "skipped"
            )
            rows.append({"accum": s, "failed": type(e).__name__})
            continue
        rows.append({"accum": s, "step_ms": step_ms})
        log(
            f"grad-accum autotune: accum {s} (microbatch "
            f"{per_device_batch // s}) = {step_ms:.2f} ms full step "
            f"(compile+measure {time.perf_counter() - t0:.0f}s)"
        )
        if step_ms < best_ms:
            best_s, best_ms = s, step_ms
    log(f"grad-accum autotune: picked {best_s} (cap model said {cap_pick})")
    if cache_path and ckey:
        _cache_store(
            cache_path, ckey,
            {"pick": best_s, "candidates": rows,
             "saved_at": time.strftime("%Y-%m-%dT%H:%M:%S")},
        )
    return best_s


# ---------------------------------------------------------------------------
# ConvSBS (legacy family) kernel autotuning — VERDICT r4 #4.
#
# The fused TT-fold kernels (pallas/sbs_pallas.py) have three shape-coupled
# knobs the heuristics pick blind: the pixel tile bn (the r4 bn=4096 probe
# went BOTH ways by shape — faster at open bs 100, slower everywhere else),
# the meet-in-the-middle merge position mcut (picked by exact mult count,
# which ignores relayout/op-overhead), and the r5 dcore_dot flag (d_core/d_v
# via MXU dots vs qc-unrolled VPU reductions). Like the EPS splits, the
# optimum is shape-dependent → measure. Unlike splits, the knobs don't
# change any stored layout, so tuned picks are pure jit-time parameters
# (no resume conversion, no checkpoint coupling).


def _sbs_layer_dims(cfg):
    """Per-layer (spec, (in_C, in_Q)) chain of the legacy model; each
    layer's strings share one spec structure, so one measurement per layer
    covers both strings. The spatial dims shrink by 2 per 3×3 snake layer —
    the caller tracks that from image_size."""
    specs = cfg.layer_specs()
    dims = []
    c, q = 1, 2
    for li, layer_spec in enumerate(specs):
        dims.append((layer_spec[0], (c, q)))
        c, q = len(layer_spec), 2 if li < len(specs) - 1 else cfg.num_labels
    return dims


def _sbs_cache_key(cfg, image_size, batch_size, *, forward_only, interpret):
    device = "interpret" if interpret else jax.devices()[0].device_kind
    key = {
        "schema": _CACHE_SCHEMA,
        "family": "conv_sbs",
        "device_kind": device,
        "num_sbs_layers": cfg.num_sbs_layers,
        "bond_dim_size": cfg.bond_dim_size,
        "trace_edge": cfg.trace_edge,
        "num_labels": cfg.num_labels,
        "image_size": image_size,
        "batch_size": batch_size,
        "objective": "serve" if forward_only else "train",
        "vmem_budget_mb": os.environ.get("DCTN_TPU_VMEM_BUDGET_MB", "56"),
        "tuner": "greedy-v4",  # bump when the search strategy changes
    }
    return json.dumps(key, sort_keys=True)


def _measure_sbs_candidate(
    spec, in_c, in_q, h, w, batch_size, interpret, is_first_layer, key,
    forward_only, mim, bn, mcut, dcore_dot,
):
    """ms of one string's fwd(+bwd) at one knob setting, synthetic operands
    (shape-only timing, like the EPS measurer)."""
    from ..ops import sbs as sbs_mod
    from ..pallas.sbs_pallas import conv_sbs_pallas_t

    ks = jax.random.split(key, len(spec) + 1)
    cores = tuple(
        0.5 * jax.random.normal(k, s.as_tuple(), jnp.float32)
        for k, s in zip(ks[:-1], spec.shapes)
    )
    xT = jax.random.uniform(ks[-1], (in_c, in_q, h, w, batch_size), jnp.float32)
    kw = dict(
        interpret=interpret, mim=mim, bn=bn, mcut=mcut, dcore_dot=dcore_dot,
        need_dviews=not is_first_layer,
    )

    def loss(cores_, xT_):
        return jnp.sum(conv_sbs_pallas_t(spec, cores_, xT_, **kw))

    box = {}
    if forward_only:
        fwd = jax.jit(loss)

        def call():
            box["v"] = fwd(cores, xT)
            return box["v"]

    else:
        argnums = 0 if is_first_layer else (0, 1)
        step = jax.jit(jax.value_and_grad(loss, argnums=argnums))

        def call():
            box["v"], box["g"] = step(cores, xT)
            return box["v"]

    call()
    float(box["v"])  # fence the warmup
    if interpret:
        t0 = time.perf_counter()
        for _ in range(2):
            call()
        float(box["v"])
        return (time.perf_counter() - t0) / 2 * 1e3
    iters, best = 32, float("inf")
    for _ in range(2):
        s_per_iter, iters = _timed_window(call, iters)
        best = min(best, s_per_iter)
    return best * 1e3


def autotune_conv_sbs(
    cfg,
    image_size: int,
    batch_size: int,
    *,
    forward_only: bool = False,
    min_gain: float = 0.05,
    log_fn: Optional[Callable[[str], None]] = None,
    seed: int = 0,
    cache_path: Optional[str] = None,
):
    """Measure-and-pick (bn, mcut, dcore_dot, mim) per legacy-model layer.
    Returns (kernel_tuning, report): ``kernel_tuning`` plugs into
    ``ConvSBSModelConfig.kernel_tuning``; ``report`` has every measured
    candidate. Greedy coordinate descent per layer (each knob measured with
    the others fixed — ~8 compiles/layer instead of the full product), each
    stage keeping the heuristic pick unless a candidate beats it by
    ``min_gain``: mim family + dcore_dot first (the backward's biggest
    structural choice), then bn, then mcut.

    The knobs are jit-time only (no stored-layout coupling — unlike EPS
    splits there is nothing to convert on resume), so applying a cached or
    freshly measured pick is always safe. Contrast with the reference's
    ``contraction_path_cache.py``, which caches opt_einsum PLANS but never
    measures alternatives."""
    from ..pallas.sbs_pallas import _mim_cut, _pick_bn, sbs_plan

    log = log_fn or (lambda s: None)
    interpret = cfg.backend == "pallas_interpret"
    ckey = None
    if cache_path:
        ckey = _sbs_cache_key(
            cfg, image_size, batch_size,
            forward_only=forward_only, interpret=interpret,
        )
        hit = _cache_load(cache_path).get(ckey)
        if hit is not None and len(hit.get("picks", [])) == cfg.num_sbs_layers:
            log(
                f"conv_sbs autotune cache hit ({cache_path}): "
                f"{hit['picks']} reused without re-measuring"
            )
            return (
                tuple(tuple(p) if p else None for p in hit["picks"]),
                [{**r, "cached": True} for r in hit.get("report", [])],
            )

    key = jax.random.PRNGKey(seed)
    picks, report = [], []
    for li, (spec, (in_c, in_q)) in enumerate(_sbs_layer_dims(cfg)):
        h = w = image_size - 2 * li  # 3x3 snake layers shrink H by 2 each
        olr, qc, supported = sbs_plan(spec)
        if not supported:
            picks.append(None)
            report.append({"layer": li, "skipped": "spec unsupported"})
            continue
        hp = h - 2  # 3x3 snake windows
        npix = batch_size * hp * hp
        bn0 = _pick_bn(olr, qc, npix)
        mcut0 = _mim_cut(olr)
        rows = []
        measured = {}

        def measure(mim, bn, mcut, dot, key=key, li=li):
            tag = (mim, bn, mcut, dot)
            if tag in measured:
                return measured[tag]
            t0 = time.perf_counter()
            try:
                ms = _measure_sbs_candidate(
                    spec, in_c, in_q, h, w, batch_size, interpret, li == 0,
                    jax.random.fold_in(key, hash(tag) % (1 << 30)),
                    forward_only, mim, bn, mcut, dot,
                )
            except Exception as e:
                log(
                    f"conv_sbs autotune L{li} {tag}: candidate failed "
                    f"({type(e).__name__}) — skipped"
                )
                measured[tag] = None
                rows.append(
                    {"mim": mim, "bn": bn, "mcut": mcut, "dcore_dot": dot,
                     "failed": type(e).__name__}
                )
                return None
            measured[tag] = ms
            rows.append(
                {"mim": mim, "bn": bn, "mcut": mcut, "dcore_dot": dot,
                 "ms": ms}
            )
            log(
                f"conv_sbs autotune L{li} mim={mim} bn={bn} mcut={mcut} "
                f"dot={dot}: {ms:.3f} ms "
                + ("fwd" if forward_only else "fwd+bwd")
                + f" (compile+measure {time.perf_counter() - t0:.0f}s)"
            )
            return ms

        def better(candidate_ms, incumbent_ms):
            return (
                candidate_ms is not None
                and incumbent_ms is not None
                and incumbent_ms / candidate_ms >= 1.0 + min_gain
            )

        # stage 1: kernel family + gradient-tail route at heuristic tiles
        mim, dot = mcut0 is not None, False
        base_ms = measure(mim, bn0, mcut0 if mim else None, dot)
        if not forward_only:
            if better(measure(mim, bn0, mcut0 if mim else None, True),
                      base_ms):
                dot = True
                base_ms = measured[(mim, bn0, mcut0 if mim else None, True)]
        alt_mim = not mim
        alt_ms = measure(
            alt_mim, bn0, _mim_cut(olr) if alt_mim else None, dot
        )
        if better(alt_ms, base_ms):
            mim, base_ms = alt_mim, alt_ms
        mcut = (mcut0 if mcut0 is not None else max(1, len(olr) // 2)) if mim else None

        # stage 2: pixel tile — measure every candidate, keep the best
        bn = bn0
        cap = max(128, -(-npix // 128) * 128)
        for bn_c in (4096, 2048, 1024, 512):
            if bn_c == bn0 or bn_c > cap:
                continue
            if better(measure(mim, bn_c, mcut, dot), base_ms):
                bn, base_ms = bn_c, measured[(mim, bn_c, mcut, dot)]

        # stage 3: merge position — walk from the mult-count pick in the
        # improving direction until gains stop (measured r5: the model's
        # pick was off by one on EVERY legacy config — mcut 5 beat 4 by up
        # to 38% per layer; exact mult count ignores per-op overhead)
        if mim and mcut is not None:
            for direction in (-1, +1):
                moved = False
                mcut_c = mcut + direction
                while 1 <= mcut_c < len(olr):
                    if not better(measure(mim, bn, mcut_c, dot), base_ms):
                        break
                    mcut, base_ms = mcut_c, measured[(mim, bn, mcut_c, dot)]
                    moved = True
                    mcut_c += direction
                if moved:
                    break  # the other direction can only be worse

        pick = (bn, mcut, dot, mim)
        heuristic = (bn0, mcut0 if (mcut0 is not None) else None, False,
                     mcut0 is not None)
        if pick == heuristic:
            pick = None  # heuristics won everywhere — store "no override"
        picks.append(pick)
        log(f"conv_sbs autotune L{li}: picked {pick} (heuristic {heuristic})")
        report.append(
            {"layer": li, "candidates": rows, "picked": pick,
             "heuristic": list(heuristic), "best_ms": base_ms}
        )
    # WHOLE-MODEL composition stage: per-layer winners do not always
    # compose (measured r5: open-string serving per-layer picks were 50%
    # SLOWER whole-model — sbs_serving_tune_probe_results.json). When any
    # pick deviates, measure the heuristic baseline, the per-layer-winner
    # combo, AND the cross product of each layer's top-2 candidates (capped
    # at 8 combos, ranked by the sum of their per-layer times) — the
    # whole-model winner must beat the baseline by min_gain/2 or the picks
    # are discarded. The outcome is cached either way, so consumers can
    # never apply a composing-worse tuning.
    if any(p for p in picks):
        try:
            import itertools as _it

            ms_h = _measure_sbs_model(
                cfg, (), image_size, batch_size, interpret, forward_only, key
            )
            log(f"conv_sbs autotune whole-model baseline: {ms_h:.3f} ms")
            # per-layer top-2 candidate picks (None = that layer's
            # heuristic); one options list per MODEL layer, in order —
            # unsupported layers contribute only their heuristic
            layer_reports = {
                li: r
                for li, r in enumerate(r for r in report if "layer" in r)
            }
            layer_options = []
            for li in range(len(picks)):
                rep = layer_reports.get(li, {})
                opts, seen = [(None, 0.0)], {None}
                for r in sorted(
                    (r for r in rep.get("candidates", ()) if "ms" in r),
                    key=lambda r: r["ms"],
                )[:2]:
                    p = (r["bn"], r["mcut"], r["dcore_dot"], r["mim"])
                    if tuple(rep.get("heuristic", ())) == p:
                        p = None
                    if p not in seen:
                        seen.add(p)
                        opts.append((p, r["ms"]))
                layer_options.append(opts)
            combos = sorted(
                _it.product(*layer_options),
                key=lambda combo: sum(ms for _, ms in combo),
            )[:8]
            best_combo, best_ms = None, None
            for combo in combos:
                combo_picks = tuple(p for p, _ in combo)
                if not any(combo_picks):
                    continue  # the all-heuristic baseline, already measured
                ms_c = _measure_sbs_model(
                    cfg, combo_picks, image_size, batch_size, interpret,
                    forward_only, key,
                )
                log(
                    f"conv_sbs autotune whole-model combo {combo_picks}: "
                    f"{ms_c:.3f} ms"
                )
                if ms_c is not None and (best_ms is None or ms_c < best_ms):
                    best_combo, best_ms = combo_picks, ms_c
            # full min_gain margin: sub-ms whole-model steps carry ~2-5%
            # run-to-run noise (measured: a 2.5% open-string "win" inside
            # the tuner did not replicate on re-measurement)
            if (
                best_combo is None
                or not ms_h / best_ms >= 1.0 + min_gain
            ):
                best_ms = ms_h
                log(
                    "conv_sbs autotune: no combo beats the heuristic "
                    "whole-model — keeping heuristics"
                )
                picks = [None] * len(picks)
            else:
                picks = list(best_combo)
                log(
                    f"conv_sbs autotune: whole-model winner {best_combo} "
                    f"({ms_h:.3f} -> {best_ms:.3f} ms)"
                )
            report.append(
                {"whole_model": {"heuristic_ms": ms_h, "best_ms": best_ms,
                                 "kept": bool(any(picks))}}
            )
        except Exception as e:  # validation must never lose the tuning run
            log(
                f"conv_sbs autotune: whole-model validation failed "
                f"({type(e).__name__}) — keeping heuristics"
            )
            picks = [None] * len(picks)
    if cache_path:
        _cache_store(
            cache_path, ckey,
            {
                "picks": [list(p) if p else None for p in picks],
                "report": report,
                "saved_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            },
        )
    return tuple(tuple(p) if p else None for p in picks), report


def _measure_sbs_model(
    cfg, tuning, image_size, batch_size, interpret, forward_only, key
):
    """Whole-model ms of the legacy forward (serving) or fwd+bwd (training)
    under a kernel_tuning — the composition check the per-layer search
    cannot do."""
    import dataclasses as _dc

    from ..models.conv_sbs_model import (
        conv_sbs_model_forward,
        init_conv_sbs_model,
    )

    cfg_m = _dc.replace(cfg, kernel_tuning=tuple(tuning))
    params = init_conv_sbs_model(key, cfg_m)
    x = jax.random.uniform(key, (batch_size, image_size, image_size))
    if forward_only:
        fn = jax.jit(lambda p, xb: conv_sbs_model_forward(p, cfg_m, xb))
        box = {}

        def call():
            box["v"] = fn(params, x)
            return box["v"]

    else:
        grad_fn = jax.jit(
            jax.value_and_grad(
                lambda p, xb: jnp.sum(
                    jnp.tanh(conv_sbs_model_forward(p, cfg_m, xb))
                )
            )
        )
        box = {}

        def call():
            box["v"], box["g"] = grad_fn(params, x)
            return box["v"]

    call()
    float(jnp.sum(box["v"]))  # fence the warmup (relay-safe scalar fetch;
    # block_until_ready is unreliable on the axon relay)
    if interpret:
        t0 = time.perf_counter()
        for _ in range(2):
            call()
        float(jnp.sum(box["v"]))
        return (time.perf_counter() - t0) / 2 * 1e3
    iters, best = 32, float("inf")
    for _ in range(2):
        s_per_iter, iters = _timed_window(call, iters)
        best = min(best, s_per_iter)
    return best * 1e3
