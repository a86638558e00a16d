"""In-program probe of the flagship step's per-kernel cost at modest batch
(VERDICT r2 next-round #5): times each Pallas kernel of the two-EPS
FashionMNIST fast step with a data-dependent fori_loop repeat (standalone
micro-jits through the axon relay are dispatch-bound at a ~1.5-3.3 ms floor
and mislead — the r2 lesson), sweeping the pixel-tile size bn.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/bs128_kernel_probe.py [bs ...]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from dctn_tpu.pallas.eps_pallas import (
    _run_fwd,
    _run_bwd,
    _run_bwd_fused,
    _run_bwd_fused_t,
    _largest_bn,
    _fused_bytes,
    _fused_t_bytes,
    _dcore_bytes,
    _dviews_bytes,
    _dviews_t_bytes,
    plan_pallas_call,
)

REPEATS = 30

# Every fenced window through the axon relay costs a fixed ~26-28 ms
# (program dispatch + final scalar fetch) REGARDLESS of window length; at
# REPEATS=30 that silently adds ~0.9 ms to every per-call figure (this is
# what minted the phantom "bs-128 in-kernel small-grid inefficiency" —
# docs/performance.md measurement rules). Calibrate it once with an empty
# window and subtract.
_WINDOW_MS = None


def _window_constant_ms():
    global _WINDOW_MS
    if _WINDOW_MS is None:

        @jax.jit
        def empty(s0):
            return jax.lax.fori_loop(0, REPEATS, lambda i, s: s + 1e-30, s0)

        float(empty(jnp.float32(0.0)))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(empty(jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        _WINDOW_MS = best * 1e3
        print(f"(window constant: {_WINDOW_MS:.1f} ms per fenced window)")
    return _WINDOW_MS


def timed_loop(fn, *arrays):
    """Median-of-3 of an in-program ``REPEATS``-iteration data-dependent
    chain: iteration i's first operand is nudged by iteration i-1's output
    scalar so XLA cannot hoist or overlap the calls. The fixed per-window
    relay cost is calibrated and subtracted."""

    @jax.jit
    def many(*args):
        def body(i, s):
            a0 = args[0] + s * 1e-30
            out = fn(a0, *args[1:])
            if isinstance(out, tuple):
                out = out[0]
            return s + out.ravel()[0] * 1e-30

        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0.0))

    const = _window_constant_ms()
    r = many(*arrays)
    float(r)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(*arrays))
        best = min(best, time.perf_counter() - t0)
    return max(0.0, best * 1e3 - const) / REPEATS  # ms per call


def probe_layer(name, c, q, k, o, b, hw, mm_dtype=jnp.bfloat16):
    hp = hw - k + 1
    npix = b * hp * hp
    n = k * k * c
    from dctn_tpu.ops.eps import _balanced_split

    n1, bn_plan, merge_pairs, mm = plan_pallas_call(
        c, q, k, _balanced_split(n, q, o), o, npix, None, False
    )
    n_k = n // 2 if merge_pairs else n
    q_k = q * q if merge_pairs else q
    n1_k = n1 // 2 if merge_pairs else n1
    a, z = q_k**n1_k, q_k ** (n_k - n1_k) * o
    key = jax.random.PRNGKey(0)
    print(
        f"{name}: n_k={n_k} q_k={q_k} n1_k={n1_k} o={o} npix={npix} "
        f"(plan bn={bn_plan}, cmt {z}x{a})"
    )
    for bn in (2048, 1024, 512, 256):
        npad = -(-npix // bn) * bn
        views = jax.random.uniform(key, (n_k, q_k, npad), jnp.float32)
        cmt = (0.1 * jax.random.normal(key, (z, a), jnp.float32)).astype(mm)
        g = jax.random.normal(key, (o, npad), jnp.float32)
        mb = jnp.dtype(mm).itemsize
        row = [f"  bn={bn}:"]
        from dctn_tpu.pallas.eps_pallas import _fwd_bytes

        if _fwd_bytes(n_k, n1_k, q_k, o, bn, mb) < 14 * 2**20:
            t = timed_loop(
                lambda v, c_: _run_fwd(v, c_, n1_k, o, bn, False), views, cmt
            )
            row.append(f"fwd {t:7.3f}ms")
        bn_f = _largest_bn(
            lambda v: _fused_bytes(n_k, n1_k, q_k, o, v, mb), cap=bn
        )
        if bn_f == bn:
            t = timed_loop(
                lambda v, c_, g_: _run_bwd_fused(v, c_, g_, n1_k, o, bn, False),
                views, cmt, g,
            )
            row.append(f"bwd_fused {t:7.3f}ms")
        bn_a = _largest_bn(
            lambda v: _dcore_bytes(n_k, n1_k, q_k, o, v, mb), cap=bn
        )
        bn_b = _largest_bn(
            lambda v: _dviews_bytes(n_k, n1_k, q_k, o, v, mb), cap=bn
        )
        if bn_a == bn and bn_b is not None:
            t = timed_loop(
                lambda v, c_, g_: _run_bwd(
                    v, c_, g_, n1_k, o, bn_a, bn_b, False, mm
                ),
                views, cmt, g,
            )
            row.append(f"bwd_2pass(bn_b={bn_b}) {t:7.3f}ms")
        # forward-saved-t backward variants (r3): the t-recompute matmul is
        # replaced by streaming the (z, npad) storage-dtype t from HBM
        if n_k - n1_k > 0:
            tsaved = jax.random.normal(key, (z, npad), jnp.float32).astype(mm)
            bn_ft = _largest_bn(
                lambda v: _fused_t_bytes(n_k, n1_k, q_k, o, v, mb), cap=bn
            )
            if bn_ft == bn:
                t = timed_loop(
                    lambda v, c_, g_, t_: _run_bwd_fused_t(
                        v, c_, g_, t_, n1_k, o, bn, False
                    ),
                    views, cmt, g, tsaved,
                )
                row.append(f"bwd_fused_t {t:7.3f}ms")
            bn_bt = _largest_bn(
                lambda v: _dviews_t_bytes(n_k, n1_k, q_k, o, v, mb), cap=bn
            )
            if bn_a == bn and bn_bt is not None:
                t = timed_loop(
                    lambda v, c_, g_, t_: _run_bwd(
                        v, c_, g_, n1_k, o, bn_a, bn_bt, False, mm, t=t_
                    ),
                    views, cmt, g, tsaved,
                )
                row.append(f"bwd_2pass_t(bn_b={bn_bt}) {t:7.3f}ms")
        if len(row) > 1:
            print(" ".join(row))


def main():
    bss = [int(a) for a in sys.argv[1:]] or [128, 2048]
    for bs in bss:
        print(f"===== batch {bs} =====")
        probe_layer("L0 (K=4, 2->4)", 1, 2, 4, 4, bs, 28)
        probe_layer("L1 (K=3, 4->6)", 1, 4, 3, 6, bs, 25)


if __name__ == "__main__":
    main()
