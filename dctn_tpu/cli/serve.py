"""Minimal production inference server over a deployment artifact.

stdlib HTTP (no web framework — the image has none, and none is needed):
load a ``cli/export.py`` artifact once, serve logits/predictions from the
exported entry points. The reference has no serving surface at all
(SURVEY §2.2); together with export this is the framework's last mile:
train → export → serve, with the serving host needing only jax.

Endpoints:
  GET  /healthz           {"status": "ok", "batch_sizes": [...], ...}
  GET  /meta              the artifact's meta.json
  POST /predict           body: a .npy array — (channels, bs, H, W, q0) for
                          the eps family, (bs, H, W) for conv_sbs. Any bs:
                          requests are padded/chunked onto the exported
                          entry points. Response: logits as .npy, or
                          {"predictions": [...]} with ?format=json.

Usage:
  python -m dctn_tpu.cli.serve model.dctnx --port 8000
  curl -s --data-binary @batch.npy localhost:8000/predict?format=json
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import click
import numpy as np

from .export import load_artifact


class ArtifactModel:
    """Batch-size routing over an artifact's static entry points: a request
    of any batch size is chunked to the largest exported size and the tail
    padded to the smallest one that fits (padding rows are model re-runs of
    the last example; they are trimmed before returning)."""

    def __init__(self, path: str):
        self.meta, self.fns = load_artifact(path)
        self.sizes = sorted(self.fns)
        self.family = self.meta.get("model_family", "eps")
        self.batch_axis = 1 if self.family == "eps" else 0
        self.in_dtype = self.meta.get("in_dtype", "float32")
        self._lock = threading.Lock()  # device calls are serialized

    def _call(self, bs: int, xb: np.ndarray) -> np.ndarray:
        return np.asarray(self.fns[bs](xb.astype(self.in_dtype)))

    def predict(self, x: np.ndarray) -> np.ndarray:
        ax = self.batch_axis
        n = x.shape[ax]
        if n == 0:
            raise ValueError("empty batch")
        outs = []
        with self._lock:
            start = 0
            while start < n:
                take = min(n - start, self.sizes[-1])
                bs = next(s for s in self.sizes if s >= take)
                xb = np.take(x, range(start, start + take), axis=ax)
                if take < bs:
                    last = np.take(xb, [take - 1] * (bs - take), axis=ax)
                    xb = np.concatenate([xb, last], axis=ax)
                outs.append(self._call(bs, xb)[:take])
                start += take
        return np.concatenate(outs)


def _handler_for(model: ArtifactModel):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet; the CLI logs startup only
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "model_family": model.family,
                    "batch_sizes": model.sizes,
                    "platforms": model.meta.get("platforms"),
                })
            elif path == "/meta":
                self._json(200, model.meta)
            else:
                self._json(404, {"error": f"no route {path!r}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                return self._json(404, {"error": f"no route {url.path!r}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                x = np.load(io.BytesIO(self.rfile.read(length)),
                            allow_pickle=False)
            except Exception as e:  # not a .npy body → client error
                return self._json(400, {"error": str(e)})
            try:
                logits = model.predict(x)
            except (ValueError, TypeError, KeyError) as e:
                # shape/dtype/rank mismatches → client error
                return self._json(400, {"error": str(e)})
            except Exception as e:
                # device lost, compile failure, OOM → SERVER error: tell
                # callers/load-balancers to retry elsewhere, not to drop
                # the request as malformed
                return self._json(500, {"error": str(e)})
            fmt = parse_qs(url.query).get("format", ["npy"])[0]
            if fmt == "json":
                self._json(200, {
                    "predictions": np.argmax(logits, axis=1).tolist(),
                })
            else:
                buf = io.BytesIO()
                np.save(buf, logits)
                self._send(200, buf.getvalue(), "application/octet-stream")

    return Handler


def make_server(artifact: str, host: str = "127.0.0.1", port: int = 0):
    """(server, model) — serve with ``server.serve_forever()``; port 0 picks
    an ephemeral one (``server.server_address[1]``)."""
    model = ArtifactModel(artifact)
    server = ThreadingHTTPServer((host, port), _handler_for(model))
    return server, model


@click.command()
@click.argument("artifact", type=click.Path(exists=True, dir_okay=False))
@click.option("--host", default="127.0.0.1")
@click.option("--port", type=int, default=8000)
def main(artifact, host, port):
    server, model = make_server(artifact, host, port)
    print(
        f"serving {model.family} artifact on http://{host}:"
        f"{server.server_address[1]} (entry points: bs {model.sizes})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
