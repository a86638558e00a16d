"""Inference / serving entry point: load a checkpoint, emit predictions and
latency statistics.

The reference has no serving surface (its closest analog is the
pre-publication batch evaluation scripts,
``small_experiments/pre_publishing_test_evaluation/*.py``); this CLI is the
deployment-facing complement: batch prediction to a file plus a fenced
latency benchmark (batch-1 and batch-N) of the jitted forward on whatever
backend the host has (fused Pallas kernels on TPU).

Usage:
  python -m dctn_tpu.cli.predict CKPT.npz --ds-type fashionmnist \
      --ds-path synthetic --epses-specs "(2,4)" --split test \
      --out preds.npy --latency-bench
  # or serve straight from a cli/export.py deployment artifact (model
  # config + weights come from the artifact; --epses-specs not needed):
  python -m dctn_tpu.cli.predict model.dctnx --ds-type fashionmnist \
      --ds-path synthetic --split test --batch-size 128
"""

from __future__ import annotations

import json
import time

import click
import jax
import jax.numpy as jnp
import numpy as np

from ..data import load_dataset
from ..models import (
    EPSesPlusLinearConfig,
    eps_plus_linear_forward,
    init_eps_plus_linear,
)
from ..train import load_pytree
from .runner import parse_epses_specs


def _is_artifact(path: str) -> bool:
    """True iff ``path`` is a cli/export.py deployment artifact (a zip with
    meta.json) rather than an npz checkpoint."""
    import zipfile

    if not zipfile.is_zipfile(path):
        return False
    with zipfile.ZipFile(path) as zf:
        return "meta.json" in zf.namelist()


def _artifact_forward(path: str, batch_sizes):
    """(cfg, forward_fn) serving straight from an exported artifact — the
    weights live inside the StableHLO module, so ``params`` is ignored.
    Every batch size the caller will use must have an exported entry
    (artifacts are static-shaped by design, docs/deployment.md)."""
    from .export import load_artifact

    meta, fns = load_artifact(path)
    family = meta.get("model_family", "eps")
    if family != "eps":
        raise click.UsageError(
            f"predict serves eps-family artifacts; this one is {family!r}"
        )
    missing = [bs for bs in batch_sizes if bs not in fns]
    if missing:
        raise click.UsageError(
            f"artifact has entry points for batch sizes {sorted(fns)}; "
            f"missing {missing} — re-export with --batch-sizes"
        )
    cfg = EPSesPlusLinearConfig(
        epses_specs=tuple(tuple(s) for s in meta["epses_specs"]),
        image_size=meta["image_size"],
        q0=meta["q0"],
        num_classes=meta.get("num_classes", 10),
    )

    in_dtype = meta.get("in_dtype", "float32")

    def forward_fn(_params, xb):
        # exported modules are strict about input dtypes (tests run x64)
        return fns[xb.shape[1]](xb.astype(in_dtype))

    return meta, cfg, forward_fn


def _resolve_forward(params, cfg, splits=None, quantize=None):
    """(forward_params, forward_fn): the fast (cmt) Pallas pipeline when
    every layer fits its plans (the serving-optimal path — no boundary
    relayouts), else the reference-layout forward. ``splits``: optional
    per-layer matmul splits (n1) overriding the cost model — e.g. the
    serving-objective picks from ``train.autotune.autotune_splits(...,
    forward_only=True)``; exact (splits only re-matricize the cores).
    ``quantize="int8"``: W8A8 dynamic quantization of the EPS matmuls
    (pallas/eps_pallas_q8.py) — requires the fast pipeline (raises
    FastLayoutUnavailable when a layer doesn't fit); ~2× the MXU rate on
    v5e and 4× smaller baked-in weights, at the cost of int8 rounding
    noise in the logits."""
    assert quantize in (None, "int8"), quantize
    if cfg.eval_backend in ("pallas", "pallas_interpret"):
        from ..models.eps_plus_linear import (
            FastLayoutUnavailable,
            eps_plus_linear_forward_fast,
            fast_layer_plans,
            fast_params_from_reference,
        )

        try:
            k0 = cfg.epses_specs[0][0]
            in_ch = (params["epses"][0].ndim - 1) // (k0 * k0)
            plans = fast_layer_plans(cfg, in_ch)
            if splits is not None:
                plans = tuple(
                    {**p, "n1": n1} for p, n1 in zip(plans, splits)
                )
            fast, plans = fast_params_from_reference(params, cfg, plans=plans)
        except FastLayoutUnavailable:
            if quantize:
                raise
        else:
            if quantize == "int8":
                from ..pallas.eps_pallas_q8 import (
                    forward_fast_q8,
                    quantize_fast_params,
                )

                qparams = quantize_fast_params(fast, plans)
                interp = cfg.eval_backend == "pallas_interpret"
                return qparams, (
                    lambda f, xb: forward_fast_q8(
                        f, xb, cfg, plans, interpret=interp
                    )
                )
            return fast, (
                lambda f, xb: eps_plus_linear_forward_fast(
                    f, xb, cfg, plans, training=False
                )
            )
    if quantize:
        raise ValueError(
            "quantize needs the pallas eval backend (the q8 kernels live on "
            "the fast pipeline)"
        )
    return params, lambda p, xb: eps_plus_linear_forward(p, xb, cfg, training=False)


def predict_split(params, cfg, x, batch_size: int, forward_fn=None) -> np.ndarray:
    """Argmax predictions over a (C, N, H, W, Q) split, batched; the last
    ragged batch is padded and trimmed (static shapes → one compile)."""
    if forward_fn is None:
        params, forward_fn = _resolve_forward(params, cfg)
    forward = jax.jit(
        lambda p, xb: jnp.argmax(forward_fn(p, xb), axis=1)
    )
    n = x.shape[1]
    preds = []
    for start in range(0, n, batch_size):
        xb = x[:, start : start + batch_size]
        pad = batch_size - xb.shape[1]
        if pad:
            xb = jnp.concatenate([xb, xb[:, :1].repeat(pad, axis=1)], axis=1)
        p = np.asarray(forward(params, xb))
        preds.append(p[: batch_size - pad] if pad else p)
    return np.concatenate(preds)


def latency_stats(params, cfg, x, batch_size: int, iters: int = 30,
                  forward_fn=None) -> dict:
    """Fenced per-call latency of the jitted forward (value-fetch sync — the
    reliable fence on the tunneled backend)."""
    if forward_fn is None:
        params, forward_fn = _resolve_forward(params, cfg)
    forward = jax.jit(forward_fn)
    xb = jnp.asarray(x[:, :batch_size])
    out = forward(params, xb)
    float(jnp.sum(out))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = forward(params, xb)
        float(jnp.sum(out))  # per-call fence: this IS the serving latency
        times.append(time.perf_counter() - t0)
    times.sort()
    # pipelined throughput: async dispatches, ONE fence — the steady-state
    # serving rate under a full request queue. A long window amortizes the
    # fixed per-window dispatch+fence cost (docs/performance.md measurement
    # rules); the per-call numbers above are the true request LATENCY.
    window = min(2048, max(iters, 49152 // batch_size))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(window):
            out = forward(params, xb)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return {
        "batch_size": batch_size,
        "p50_ms": round(1e3 * times[len(times) // 2], 3),
        "p90_ms": round(1e3 * times[int(len(times) * 0.9)], 3),
        "min_ms": round(1e3 * times[0], 3),
        "throughput_img_per_s": round(batch_size / times[len(times) // 2], 1),
        "pipelined_throughput_img_per_s": round(batch_size * window / best, 1),
    }


@click.command()
@click.argument("checkpoint", type=click.Path(exists=True, dir_okay=False))
@click.option("--ds-type", required=True)
@click.option("--ds-path", required=True)
@click.option("--epses-specs", type=parse_epses_specs, default=None,
              help="required for npz checkpoints; exported artifacts carry "
                   "their own model config")
@click.option("--phi-multiplier", type=float, default=None)
@click.option("--split", type=click.Choice(("train", "val", "test")), default="test")
@click.option("--batch-size", type=int, default=128)
@click.option("--out", type=click.Path(dir_okay=False), default=None,
              help="write predictions (int64 npy) here")
@click.option("--latency-bench", is_flag=True,
              help="print a JSON latency line for batch sizes 1 and --batch-size")
@click.option("--mesh-devices", type=int, default=1,
              help="shard batch prediction over a data-parallel mesh of this "
                   "many devices (replicated params, one device-scan per "
                   "shard); latency figures stay single-device")
@click.option("--quantize", type=click.Choice(("none", "int8")),
              default="none",
              help="score through the W8A8 int8 serving forward "
                   "(pallas/eps_pallas_q8.py; npz checkpoints only — "
                   "artifacts bake their quantization at export time)")
def main(checkpoint, ds_type, ds_path, epses_specs, phi_multiplier, split,
         batch_size, out, latency_bench, mesh_devices, quantize):
    run(checkpoint=checkpoint, ds_type=ds_type, ds_path=ds_path,
        epses_specs=epses_specs, phi_multiplier=phi_multiplier, split=split,
        batch_size=batch_size, out=out, latency_bench=latency_bench,
        mesh_devices=mesh_devices, quantize=quantize)


def run(*, checkpoint, ds_type, ds_path, epses_specs=None, phi_multiplier=None,
        split="test", batch_size=128, out=None, latency_bench=False,
        mesh_devices=1, quantize="none", synthetic_sizes=(8192, 2048, 2048)):
    q = None if quantize in (None, "none") else quantize
    artifact = _is_artifact(checkpoint)
    if artifact:
        if q:
            raise click.UsageError(
                "--quantize applies to npz checkpoints; artifacts bake their "
                "quantization at export time (export --quantize int8)"
            )
        needed = {batch_size} | ({1, batch_size} if latency_bench else set())
        meta, acfg, forward_fn = _artifact_forward(checkpoint, sorted(needed))
        if meta.get("mesh_devices", 1) > 1 and mesh_devices > 1:
            raise click.UsageError(
                "sharded artifacts are already mesh-jitted — run with "
                "--mesh-devices 1 and a global --batch-size"
            )
        epses_specs = acfg.epses_specs
    elif not epses_specs:
        raise click.UsageError("--epses-specs is required for npz checkpoints")
    splits = load_dataset(
        ds_type, ds_path, phi_multiplier=phi_multiplier,
        autoscale_kernel_size=None if phi_multiplier else epses_specs[0][0],
        synthetic_sizes=synthetic_sizes,
    )
    sp = getattr(splits, split)
    image_size = sp.x.shape[2]
    q0 = sp.x.shape[-1]
    if artifact:
        channels = int(sp.x.shape[0])
        want = (meta.get("channels", channels), acfg.image_size, acfg.q0)
        if (channels, image_size, q0) != want:
            raise click.UsageError(
                f"dataset shape (channels={channels}, {image_size}, q0={q0}) "
                f"does not match the artifact (channels={want[0]}, {want[1]}, "
                f"q0={want[2]})"
            )
        cfg, params = acfg, {}
    else:
        on_tpu = jax.default_backend() == "tpu"
        # quantized scoring needs the fast pallas pipeline; off-TPU that
        # means interpret mode (slow but exact — the same kernel math)
        backend = ("pallas" if on_tpu else "pallas_interpret") if q else (
            "pallas" if on_tpu else "xla"
        )
        cfg = EPSesPlusLinearConfig(
            epses_specs=epses_specs, image_size=image_size, q0=q0,
            eval_backend=backend,
        )
        template = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
        params = load_pytree(template, checkpoint)
        params, forward_fn = _resolve_forward(params, cfg, quantize=q)
    x = jnp.asarray(sp.x)
    if mesh_devices > 1:
        from ..parallel import make_mesh, make_parallel_predict_fn, shard_split

        mesh = make_mesh(mesh_devices)
        sharded = shard_split(mesh, np.asarray(sp.x), np.asarray(sp.y))
        predict_fn = make_parallel_predict_fn(
            cfg, mesh, batch_size, forward_fn=forward_fn
        )
        preds = predict_fn(params, sharded)
    else:
        preds = predict_split(params, cfg, x, batch_size, forward_fn)
    acc = float(np.mean(preds == np.asarray(sp.y)))
    print(f"{split}: n={len(preds)} accuracy={acc:.2%}")
    if out:
        np.save(out, preds)
        print(f"predictions written to {out}")
    if latency_bench:
        for bs in sorted({1, batch_size}):
            stats = latency_stats(params, cfg, x, bs, forward_fn=forward_fn)
            print(json.dumps({"metric": "forward_latency", **stats}))
    return preds


if __name__ == "__main__":
    main()
