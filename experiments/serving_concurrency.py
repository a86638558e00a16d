"""Concurrent-client serving throughput: micro-batching on vs off.

Drives the real HTTP server (cli/serve.py) over an int8 flagship artifact
with N concurrent bs-1 clients — the worst-case online-inference pattern —
and measures aggregate requests/sec with and without cross-request
micro-batching (--microbatch-wait-ms). Every per-request device call pays
the transport floor (through the axon relay: ~24 ms), so coalescing K
requests into one shared call multiplies throughput by ~K until the entry
point fills. The reference has no serving surface (SURVEY §2.2).

  PYTHONPATH=/root/repo:/root/.axon_site python experiments/serving_concurrency.py
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
import urllib.request

RESULTS = os.path.join(
    os.path.dirname(__file__), "serving_concurrency_results.json"
)


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dctn_tpu.cli.export import build_meta, export_forward, write_artifact
    from dctn_tpu.cli.serve import make_server
    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear

    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas" if on_tpu else "pallas_interpret"
    cfg = EPSesPlusLinearConfig(
        epses_specs=((4, 4), (3, 6)), image_size=28, q0=2,
        train_backend=backend, eval_backend=backend,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    art = "/tmp/concurrency_flagship_int8.dctnx"
    serialized = export_forward(
        params, cfg, batch_sizes=(1, 128),
        platforms=("tpu",) if on_tpu else None, quantize="int8",
    )
    write_artifact(art, serialized, build_meta(
        model_family="eps", image_size=28, batch_sizes=(1, 128),
        backend=backend, quantize="int8", epses_specs=[[4, 4], [3, 6]],
        q0=2, channels=1, num_classes=10,
    ))

    x1 = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 2)),
        np.float32,
    ) * 1.4
    buf = io.BytesIO()
    np.save(buf, x1)
    body = buf.getvalue()

    rows = json.load(open(RESULTS)) if os.path.exists(RESULTS) else []

    def merge(row):
        keyf = lambda r: (r.get("clients"), r.get("microbatch_wait_ms"))
        rows[:] = [r for r in rows if keyf(r) != keyf(row)] + [row]
        json.dump(rows, open(RESULTS, "w"), indent=1)
        print(json.dumps(row), flush=True)

    n_clients, duration_s = 64, 20.0
    for wait_ms in (0.0, 25.0):
        server, model = make_server(
            art, microbatch_wait_s=wait_ms / 1e3
        )
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{server.server_address[1]}"
        # warm EVERY entry point (first compile through the relay is slow —
        # an unwarmed bs-128 entry would eat the whole measurement window)
        for bs in (1, 128):
            xw = np.repeat(x1, bs, axis=1)
            bw = io.BytesIO()
            np.save(bw, xw)
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/predict", data=bw.getvalue(), method="POST"
            )).read()
        counts = [0] * n_clients
        errors = [0] * n_clients
        lat = []
        stop = time.monotonic() + duration_s
        lock = threading.Lock()

        def client(i):
            while time.monotonic() < stop:
                t0 = time.monotonic()
                try:
                    with urllib.request.urlopen(urllib.request.Request(
                        f"{base}/predict", data=body, method="POST"
                    )) as resp:
                        resp.read()
                except OSError:
                    errors[i] += 1  # transient socket reset under load
                    continue
                with lock:
                    lat.append(time.monotonic() - t0)
                counts[i] += 1

        t0 = time.monotonic()
        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        lat.sort()
        merge({
            "clients": n_clients,
            "microbatch_wait_ms": wait_ms,
            "req_per_s": round(sum(counts) / wall, 1),
            "p50_latency_ms": round(1e3 * lat[len(lat) // 2], 1),
            "p90_latency_ms": round(1e3 * lat[int(len(lat) * 0.9)], 1),
            "requests": sum(counts),
            "transport_errors": sum(errors),
            "artifact": "flagship int8, entries bs 1+128",
            "device": str(jax.devices()[0]),
        })
        server.shutdown()
        model.close()


if __name__ == "__main__":
    main()
