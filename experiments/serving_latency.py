"""Serving latency on the real chip → serving_latency_results.json.

Measures `cli.predict.latency_stats` (per-request fenced latency + pipelined
steady-state throughput) for the flagship two-EPS (4,4),(3,6) model on the
fast (cmt) Pallas pipeline — the path `_resolve_forward` auto-selects for a
reference-layout checkpoint — the XLA reference-layout forward for
contrast, and the jax.export deployment artifact (cli/export.py, weights
baked in, exactness-checked against the in-process fast forward). The
reference has no serving surface at all (SURVEY §2.2); this is the
framework's production-inference story.

  PYTHONPATH=/root/repo:/root/.axon_site python experiments/serving_latency.py [bs ...]
"""

from __future__ import annotations

import json
import os
import sys

RESULTS = os.environ.get(
    "SWEEP_RESULTS",
    os.path.join(os.path.dirname(__file__), "serving_latency_results.json"),
)


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    batches = [int(a) for a in sys.argv[1:]] or [1, 128]

    import jax
    import jax.numpy as jnp

    from dctn_tpu.cli.predict import _resolve_forward, latency_stats
    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear

    rows = json.load(open(RESULTS)) if os.path.exists(RESULTS) else []

    def merge(row):
        keyf = lambda r: (r.get("batch_size"), r.get("path"))
        rows[:] = [r for r in rows if keyf(r) != keyf(row)] + [row]
        json.dump(rows, open(RESULTS, "w"), indent=1)
        print(json.dumps(row))

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, max(batches), 28, 28, 2), jnp.float32
    ) * 1.4

    for backend, path, quant in (
        ("pallas", "pallas_fast_cmt", None),
        ("pallas", "pallas_fast_cmt_int8", "int8"),
        ("xla", "xla_reference", None),
    ):
        cfg = EPSesPlusLinearConfig(
            epses_specs=((4, 4), (3, 6)), image_size=28, q0=2,
            train_backend=backend, eval_backend=backend,
        )
        params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
        fparams, fwd = _resolve_forward(params, cfg, quantize=quant)
        if backend == "pallas" and quant is None:
            assert "epses_cmt" in fparams, "fast layout should be auto-selected"
        if quant == "int8":
            assert "epses_q" in fparams
        for bs in batches:
            merge({**latency_stats(fparams, cfg, x, bs, forward_fn=fwd),
                   "path": path})

    # the deployment artifact (cli/export.py): serve from a jax.export blob
    # with the weights baked in — certify exactness vs the in-process fast
    # forward, then measure the same latency stats through the artifact.
    import numpy as np

    from dctn_tpu.cli.export import export_forward

    cfg = EPSesPlusLinearConfig(
        epses_specs=((4, 4), (3, 6)), image_size=28, q0=2,
        eval_backend="pallas",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    fparams, fwd = _resolve_forward(params, cfg)
    serialized = export_forward(params, cfg, batch_sizes=batches,
                                platforms=("tpu",))
    from jax import export as jax_export

    for bs in batches:
        call = jax_export.deserialize(bytearray(serialized[bs])).call
        xb = x[:, :bs]
        np.testing.assert_allclose(
            np.asarray(call(xb)),
            np.asarray(jax.jit(fwd)(fparams, xb)),
            rtol=0, atol=0,
        )
        merge({**latency_stats({}, cfg, x, bs,
                               forward_fn=lambda p, xb: call(xb)),
               "path": "exported_artifact",
               "artifact_mb": round(len(serialized[bs]) / 1e6, 2)})

    # the int8 artifact (export --quantize int8): certify exactness vs the
    # in-process W8A8 forward, then the same latency stats.
    qparams, qfwd = _resolve_forward(params, cfg, quantize="int8")
    q_serialized = export_forward(params, cfg, batch_sizes=batches,
                                  platforms=("tpu",), quantize="int8")
    for bs in batches:
        call = jax_export.deserialize(bytearray(q_serialized[bs])).call
        xb = x[:, :bs]
        np.testing.assert_allclose(
            np.asarray(call(xb)),
            np.asarray(jax.jit(qfwd)(qparams, xb)),
            rtol=0, atol=0,
        )
        merge({**latency_stats({}, cfg, x, bs,
                               forward_fn=lambda p, xb: call(xb)),
               "path": "exported_artifact_int8",
               "artifact_mb": round(len(q_serialized[bs]) / 1e6, 2)})

    # DCTN_SERVING_DEEP=1: the deep three-EPS config (4,4),(3,12),(2,24) and
    # the 3-channel CIFAR-YCbCr K=2 Q=24 config — shows the fast + int8
    # serving paths generalize past the flagship (the reference's three-EPS
    # family and its best CIFAR config, README.org:75).
    if os.environ.get("DCTN_SERVING_DEEP"):
        deep_bs = [b for b in batches if b > 1] or [128]
        for specs, img, ch, tag in (
            (((4, 4), (3, 12), (2, 24)), 28, 1, "deep3"),
            (((2, 24),), 32, 3, "cifar_c3_k2q24"),
        ):
            xin = x if ch == 1 and img == 28 else (
                jax.random.uniform(
                    jax.random.PRNGKey(2), (ch, max(deep_bs), img, img, 2),
                    jnp.float32,
                ) * 1.4
            )
            for quant, suffix in ((None, ""), ("int8", "_int8")):
                cfg = EPSesPlusLinearConfig(
                    epses_specs=specs, image_size=img, q0=2,
                    train_backend="pallas", eval_backend="pallas",
                )
                # empirical init infers C from the init input (the
                # theoretical path is single-channel by spec)
                params = init_eps_plus_linear(
                    jax.random.PRNGKey(0), cfg,
                    "unit_empirical_output_std",
                    init_input=xin[:, :64],
                ) if ch > 1 else init_eps_plus_linear(
                    jax.random.PRNGKey(0), cfg
                )
                fparams, fwd = _resolve_forward(params, cfg, quantize=quant)
                for bs in deep_bs:
                    merge({**latency_stats(fparams, cfg, xin, bs,
                                           forward_fn=fwd),
                           "path": f"{tag}_pallas_fast_cmt{suffix}"})


if __name__ == "__main__":
    main()
