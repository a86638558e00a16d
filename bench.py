#!/usr/bin/env python
"""Training-throughput benchmark (the BASELINE metric): images/sec/chip for
the two-EPS (4,4),(3,6) + linear FashionMNIST training step, full fidelity
(dropout path off, composition regularizer on, Adam), on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N, ...}

Self-describing extras (VERDICT r1 #6): XLA and Pallas paths measured in the
same run, compiler cost_analysis FLOPs / bytes-accessed per step, model-FLOPs
utilization against the chip's bf16 peak, and achieved HBM bandwidth — so the
number can be judged against roofline, not just against the only torch
hardware available here.

``vs_baseline`` (also labeled ``vs_torch_cpu_this_host``) compares against
the PyTorch reference ALGORITHM (same staged contraction math via torch ops,
fwd+bwd+Adam step) measured on this host's CPU — the only hardware here that
can run torch — cached in ``.bench_baseline.json``. The reference repo
publishes no GPU throughput numbers (BASELINE.md); the absolute img/s + MFU
figures are the primary evidence.

Env knobs: BENCH_BATCH (128), BENCH_STEPS (30), BENCH_COMPUTE_DTYPE
(float32|bfloat16, default float32), BENCH_SKIP_TORCH_BASELINE,
BENCH_SKIP_XLA_PATH (skip the second measurement when time-constrained).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# bf16 peak matmul throughput per chip, by jax device_kind (public specs)
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
}
HBM_PEAK_GBPS = {
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
}


def _cost_analysis(lowered_compiled):
    """flops + bytes accessed from the compiled executable, if the backend
    exposes them (Pallas custom calls are opaque to this — the XLA path's
    numbers describe the algorithm)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def measure_tpu(batch_size: int, steps: int, compute_dtype: str, backend: str):
    """Returns (images_per_sec, flops_per_step, bytes_per_step)."""
    import jax
    import jax.numpy as jnp

    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.train import make_optimizer, make_train_step
    from dctn_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = EPSesPlusLinearConfig(
        epses_specs=((4, 4), (3, 6)),
        image_size=28,
        q0=2,
        compute_dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        train_backend=backend,
        eval_backend=backend,
    )
    key = jax.random.PRNGKey(0)
    params = init_eps_plus_linear(key, cfg)
    opt = make_optimizer("adam", 3e-3)
    # the reference's two-EPS FashionMNIST family trained with Adam + epswise
    # L2 (the 'adam_and_epswise_l2' runs behind the 88.20% val checkpoint)
    if backend == "pallas":
        # fast (cmt) parameter layout: cores stored matricized, so the
        # per-step 10-D transposes (~3.2 ms, batch-independent) vanish —
        # trajectory-exact vs the reference layout (tests/test_fast_layout.py).
        # compute_dtype plumbs through as the kernels' mm_dtype (r3).
        from dctn_tpu.models.eps_plus_linear import (
            fast_layer_plans,
            fast_params_from_reference,
        )
        from dctn_tpu.train.step import make_fast_train_step

        # Autotuned matmul splits (train/autotune.py, measured on this
        # config: experiments/autotune_probe_results.json): (10, 6) beats
        # the analytic model's (8, 5) by ~4%/2.5% full-step at bs 128/2048
        # (29.3k/29.7k img/s). Exact — splits only re-matricize the cores;
        # any training run gets the same via --autotune-splits. Opt out
        # with BENCH_DEFAULT_SPLITS=1.
        plans = fast_layer_plans(cfg)
        if not int(os.environ.get("BENCH_DEFAULT_SPLITS", "0")):
            tuned = {(4, 4): 10, (3, 6): 6}
            plans = tuple(
                {**p, "n1": tuned.get((p["kernel_size"], p["out_size"]), p["n1"])}
                for p in plans
            )
        params, plans = fast_params_from_reference(params, cfg, plans=plans)
        step = make_fast_train_step(cfg, opt, plans, "epswise", 1e-6, donate=True)
    else:
        step = make_train_step(cfg, opt, "epswise", 1e-6, donate=True)
    opt_state = opt.init(params)
    x = jax.random.uniform(key, (1, batch_size, 28, 28, 2), jnp.float32) * 1.4
    y = jax.random.randint(key, (batch_size,), 0, 10)

    flops, bytes_ = None, None
    if backend == "xla":
        # AOT-compile only the XLA path for cost_analysis (Pallas custom
        # calls are opaque to it and the extra relay compile would be pure
        # waste — main() only reports the XLA algorithm numbers)
        try:
            compiled = step.lower(params, opt_state, jax.random.PRNGKey(1), x, y).compile()
            flops, bytes_ = _cost_analysis(compiled)
        except Exception:
            pass

    rng = jax.random.PRNGKey(1)
    # warmup / compile; NOTE: on the tunneled axon backend block_until_ready
    # does not reliably wait — only a value fetch synchronizes, so we fetch
    # the loss scalar to fence both the warmup and the timed region.
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, rng, x, y)
    float(m["loss"])
    # best of three fenced windows: the relay occasionally stalls a window
    # mid-flight (observed: an 8× inflated reading on an otherwise 2.6 ms
    # step), and the best window is the least contaminated estimate of the
    # steady-state step time
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            # donated params chain the steps; no host sync inside the loop
            params, opt_state, m = step(params, opt_state, rng, x, y)
        float(m["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)
    return batch_size * steps / best_dt, flops, bytes_


def measure_torch_reference(batch_size: int, steps: int = 3) -> float:
    """The reference's training step re-expressed minimally in torch (CPU):
    same staged half-split contraction math, CE + composition-style L2, Adam.
    Cached because it is slow."""
    cache_file = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
    key = f"two_eps_fmnist_bs{batch_size}"
    if os.path.exists(cache_file):
        with open(cache_file) as f:
            cache = json.load(f)
        if key in cache:
            return cache[key]
    else:
        cache = {}

    import torch

    torch.manual_seed(0)

    def torch_eps(core, x):
        # x: (B, H, W, Q) single channel; core: (Q,)*n + (O,)
        n = core.dim() - 1
        k = int(round((n) ** 0.5))
        b, h, w, q = x.shape
        hp, wp = h - k + 1, w - k + 1
        views = [
            x[:, dh : dh + hp, dw : dw + wp, :] for dh in range(k) for dw in range(k)
        ]
        n1 = (n + 1) // 2
        u = views[0]
        for v in views[1:n1]:
            u = (u.unsqueeze(-1) * v.unsqueeze(-2)).reshape(b, hp, wp, -1)
        vv = views[n1]
        for v in views[n1 + 1 :]:
            vv = (vv.unsqueeze(-1) * v.unsqueeze(-2)).reshape(b, hp, wp, -1)
        o = core.shape[-1]
        cm = core.reshape(q**n1, -1)
        t = u @ cm
        t = t.reshape(b, hp, wp, q ** (n - n1), o)
        return (vv.unsqueeze(-1) * t).sum(-2)

    q0 = 2
    e1 = torch.randn((q0,) * 16 + (4,), requires_grad=True)
    e2 = torch.randn((4,) * 9 + (6,), requires_grad=True)
    lw = torch.randn(23 * 23 * 6, 10, requires_grad=True)
    lb = torch.randn(10, requires_grad=True)
    with torch.no_grad():
        e1 *= 2.0**-8
        e2 *= 4.0**-4.5
        lw *= (23 * 23 * 6) ** -0.5 / 4
    optp = torch.optim.Adam([e1, e2, lw, lb], lr=3e-3)
    x = torch.rand(batch_size, 28, 28, 2) * 1.4
    y = torch.randint(0, 10, (batch_size,))

    def one_step():
        optp.zero_grad()
        h1 = torch_eps(e1, x)
        h2 = torch_eps(e2, h1)
        logits = h2.reshape(batch_size, -1) @ lw + lb
        loss = torch.nn.functional.cross_entropy(logits, y)
        reg = (e1**2).sum() + (e2**2).sum() + (lw**2).sum()  # epswise L2
        (loss + 1e-6 * reg).backward()
        optp.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    result = batch_size * steps / dt
    cache[key] = result
    with open(cache_file, "w") as f:
        json.dump(cache, f)
    return result


def _wait_for_backend() -> None:
    """The tunneled axon relay goes down for stretches (observed: most of an
    hour, during which even ``jax.devices()`` hangs forever — it cannot be
    timed out in-process). Probe the backend in a SUBPROCESS with a hard
    timeout and retry within a budget, so a transient outage delays the
    benchmark instead of hanging/killing it. Proceeds after the budget
    regardless (the in-process attempt is then the status quo)."""
    import subprocess
    import sys

    budget = float(os.environ.get("BENCH_PROBE_BUDGET_S", "2400"))
    deadline = time.monotonic() + budget
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=120,
            )
            if proc.returncode == 0 and proc.stdout.strip():
                return  # backend (tpu OR cpu fallback) is responsive
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(
                f"bench: backend probe failed {attempt}x within "
                f"{budget:.0f}s budget; proceeding anyway",
                file=sys.stderr,
            )
            return
        print(
            f"bench: backend unresponsive (attempt {attempt}); retrying",
            file=sys.stderr,
        )
        time.sleep(60)


def main() -> None:
    _wait_for_backend()
    import jax

    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    # Timed-window length scales to a fixed image budget: the relay's fence
    # round-trip is a fixed ~28 ms per window, which at 30 steps of the
    # 4.4 ms bs-128 step inflated the reading by ~0.9 ms/step (the phantom
    # "bs-128 gap" — docs/performance.md measurement rules). ~49k images
    # ≈ 1.7 s windows keep that under 2% at every batch size.
    steps = int(os.environ.get("BENCH_STEPS", "0")) or max(
        30, 49152 // batch_size
    )
    compute_dtype = os.environ.get("BENCH_COMPUTE_DTYPE", "float32")

    on_tpu = jax.default_backend() == "tpu"
    device_kind = jax.devices()[0].device_kind

    # XLA path first: its cost_analysis describes the algorithm (the Pallas
    # kernels are opaque custom calls to the analyzer)
    xla_ips = xla_flops = xla_bytes = None
    if not os.environ.get("BENCH_SKIP_XLA_PATH"):
        xla_ips, xla_flops, xla_bytes = measure_tpu(
            batch_size, steps, compute_dtype, "xla"
        )
    pallas_ips = None
    if on_tpu:
        pallas_ips, _, _ = measure_tpu(batch_size, steps, compute_dtype, "pallas")

    if xla_ips is None and pallas_ips is None:
        # BENCH_SKIP_XLA_PATH on a non-TPU host: still honor the one-JSON-line
        # contract by measuring the only path that exists
        xla_ips, xla_flops, xla_bytes = measure_tpu(
            batch_size, steps, compute_dtype, "xla"
        )
    ours = max(v for v in (xla_ips, pallas_ips) if v is not None)
    step_s = batch_size / ours

    # Roofline figures are only meaningful per-path: cost_analysis describes
    # the XLA executable, so pair its flops/bytes with the XLA step time. For
    # the best path we also report MFU computed from the same ALGORITHM flops
    # (the Pallas kernels do the same matmul work with fewer HBM round trips,
    # which cost_analysis cannot see inside the custom call).
    mfu_xla = hbm_xla = mfu_best = None
    peak = PEAK_BF16_FLOPS.get(device_kind)
    if on_tpu and xla_ips:
        xla_step_s = batch_size / xla_ips
        if xla_flops and peak:
            mfu_xla = xla_flops / xla_step_s / peak
            mfu_best = xla_flops / step_s / peak
        if xla_bytes:
            hbm_xla = xla_bytes / xla_step_s / 1e9

    if os.environ.get("BENCH_SKIP_TORCH_BASELINE"):
        baseline = None
    else:
        baseline = measure_torch_reference(batch_size)
    result = {
        "metric": "train_images_per_sec_per_chip_two_eps_fashionmnist",
        "value": round(ours, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
        "vs_torch_cpu_this_host": round(ours / baseline, 2) if baseline else None,
        "baseline": round(baseline, 1) if baseline else None,
        "baseline_hw": "pytorch reference algorithm, CPU (this host)",
        "batch_size": batch_size,
        "compute_dtype": compute_dtype,
        "device_kind": device_kind,
        "xla_images_per_sec": round(xla_ips, 1) if xla_ips else None,
        "pallas_images_per_sec": round(pallas_ips, 1) if pallas_ips else None,
        "pallas_param_layout": None if pallas_ips is None else "cmt",
        "step_ms": round(1e3 * step_s, 3),
        "flops_per_step_xla": xla_flops,
        "bytes_per_step_xla": xla_bytes,
        "xla_mfu_vs_bf16_peak": round(mfu_xla, 5) if mfu_xla else None,
        "xla_achieved_hbm_gbps": round(hbm_xla, 1) if hbm_xla else None,
        "best_path_mfu_vs_bf16_peak_algo_flops": (
            round(mfu_best, 5) if mfu_best else None
        ),
        "hbm_peak_gbps": HBM_PEAK_GBPS.get(device_kind),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
