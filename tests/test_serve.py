"""Inference-server tests: artifact-backed HTTP serving (cli/serve.py).

Covers batch routing (exact entry, padded tail, chunking past the largest
entry), both response formats, health/meta endpoints, and bad-input
handling — all against a live ThreadingHTTPServer on an ephemeral port.
"""

import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from dctn_tpu.cli.export import run as export_run
from dctn_tpu.cli.serve import make_server
from dctn_tpu.models import (
    EPSesPlusLinearConfig,
    eps_plus_linear_forward,
    init_eps_plus_linear,
)
from dctn_tpu.train import save_pytree

CFG = EPSesPlusLinearConfig(epses_specs=((2, 4),), image_size=6, q0=2)


@pytest.fixture(scope="module")
def served():
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        params = init_eps_plus_linear(jax.random.PRNGKey(0), CFG)
        ckpt = f"{tmp}/ckpt.npz"
        save_pytree(params, ckpt)
        art = f"{tmp}/model.dctnx"
        export_run(
            checkpoint=ckpt, epses_specs=((2, 4),), image_size=6, q0=2,
            batch_sizes=(2, 4), backend="xla", out=art,
        )
        server, model = make_server(art)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            yield f"http://127.0.0.1:{server.server_address[1]}", params
        finally:
            server.shutdown()


def _post(base, x, query=""):
    buf = io.BytesIO()
    np.save(buf, x)
    req = urllib.request.Request(
        f"{base}/predict{query}", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req) as resp:
        return resp.read(), resp.headers.get("Content-Type")


def _x(bs, key=1):
    return np.asarray(
        jax.random.uniform(jax.random.PRNGKey(key), (1, bs, 6, 6, 2)),
        np.float32,
    )


def _want(params, x):
    return np.asarray(
        eps_plus_linear_forward(params, x, CFG, training=False)
    )


def test_healthz_and_meta(served):
    base, _ = served
    with urllib.request.urlopen(f"{base}/healthz") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["batch_sizes"] == [2, 4]
    with urllib.request.urlopen(f"{base}/meta") as r:
        meta = json.loads(r.read())
    assert meta["epses_specs"] == [[2, 4]]


def test_predict_exact_entry(served):
    base, params = served
    x = _x(4)
    body, ctype = _post(base, x)
    assert ctype == "application/octet-stream"
    logits = np.load(io.BytesIO(body))
    np.testing.assert_array_equal(logits, _want(params, x))


def test_predict_padded_and_chunked(served):
    base, params = served
    for bs in (1, 3, 7):  # pad-to-2, pad-to-4, chunk 4 + pad-to-4
        x = _x(bs, key=bs)
        logits = np.load(io.BytesIO(_post(base, x)[0]))
        np.testing.assert_allclose(
            logits, _want(params, x), rtol=0, atol=1e-6
        )


def test_predict_json_format(served):
    base, params = served
    x = _x(4, key=11)
    body, ctype = _post(base, x, query="?format=json")
    assert ctype == "application/json"
    preds = json.loads(body)["predictions"]
    np.testing.assert_array_equal(
        preds, np.argmax(_want(params, x), axis=1)
    )


def test_serve_conv_sbs_family(tmp_path):
    """Batch routing on axis 0 (conv_sbs artifacts) incl. the padded tail."""
    from dctn_tpu.cli.export import export_conv_sbs_forward, write_artifact
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        conv_sbs_model_forward,
        init_conv_sbs_model,
    )

    cfg = ConvSBSModelConfig(num_sbs_layers=2, bond_dim_size=2)
    params = init_conv_sbs_model(jax.random.PRNGKey(1), cfg)
    art = str(tmp_path / "legacy.dctnx")
    write_artifact(
        art,
        export_conv_sbs_forward(params, cfg, batch_sizes=(4,), image_size=8),
        {"model_family": "conv_sbs", "batch_sizes": [4]},
    )
    server, model = make_server(art)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        x = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(2), (6, 8, 8)), np.float32
        )  # 6 = one full chunk of 4 + a tail padded to 4
        logits = np.load(io.BytesIO(_post(base, x)[0]))
        want = np.asarray(conv_sbs_model_forward(params, cfg, x))
        np.testing.assert_allclose(logits, want, rtol=0, atol=1e-6)
    finally:
        server.shutdown()


def test_predict_bad_input_is_400(served):
    base, _ = served
    buf = io.BytesIO()
    np.save(buf, np.zeros((3, 3), np.float32))  # wrong rank
    req = urllib.request.Request(
        f"{base}/predict", data=buf.getvalue(), method="POST"
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())

def test_serve_int8_artifact(tmp_path):
    """The HTTP server serves a --quantize int8 artifact transparently
    (meta reports the mode; logits equal the in-process W8A8 forward)."""
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference
    from dctn_tpu.pallas.eps_pallas_q8 import (
        forward_fast_q8,
        quantize_fast_params,
    )
    from dctn_tpu.train import save_pytree as _save

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=6, q0=2,
        eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(40), cfg)
    ckpt = str(tmp_path / "ckpt.npz")
    _save(params, ckpt)
    art = str(tmp_path / "q8.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=6, q0=2,
        batch_sizes=(3,), backend="pallas_interpret", quantize="int8",
        out=art,
    )
    server, model = make_server(art)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        with urllib.request.urlopen(f"{base}/meta") as resp:
            meta = json.loads(resp.read())
        assert meta["quantize"] == "int8"
        x = _x(3, key=41)
        body, ctype = _post(base, x)
        got = np.load(io.BytesIO(body))
        fast, plans = fast_params_from_reference(params, cfg)
        qparams = quantize_fast_params(fast, plans)
        want = np.asarray(
            forward_fast_q8(qparams, jax.numpy.asarray(x), cfg, plans,
                            interpret=True)
        )
        np.testing.assert_array_equal(got, want)
    finally:
        server.shutdown()

def test_serve_microbatching_coalesces(tmp_path):
    """--microbatch-wait-ms: concurrent bs-1 requests share device calls
    (fewer calls than requests) and every client still gets ITS example's
    exact logits."""
    import concurrent.futures

    params = init_eps_plus_linear(jax.random.PRNGKey(60), CFG)
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    art = str(tmp_path / "mb.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=6, q0=2,
        batch_sizes=(1, 8), backend="xla", out=art,
    )
    server, model = make_server(art, microbatch_wait_s=0.5)
    calls = []
    orig = model._call

    def counting_call(bs, xb):
        calls.append(bs)
        return orig(bs, xb)

    model._call = counting_call
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        xs = [_x(1, key=100 + i) for i in range(6)]

        def post_one(x):
            body, _ = _post(base, x)
            return np.load(io.BytesIO(body))

        with concurrent.futures.ThreadPoolExecutor(6) as pool:
            outs = list(pool.map(post_one, xs))
        for x, got in zip(xs, outs):
            np.testing.assert_allclose(
                got, _want(params, x), rtol=0, atol=1e-5
            )
        # coalescing happened: 6 concurrent bs-1 requests took < 6 calls
        assert len(calls) < 6, calls
    finally:
        server.shutdown()
        model.close()


def test_serve_microbatching_shape_isolation(tmp_path):
    """A mis-shaped request under micro-batching errors alone — it cannot
    join (or corrupt) a group of valid same-shaped requests."""
    import concurrent.futures
    import urllib.error

    params = init_eps_plus_linear(jax.random.PRNGKey(61), CFG)
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    art = str(tmp_path / "mb2.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=6, q0=2,
        batch_sizes=(1, 4), backend="xla", out=art,
    )
    server, model = make_server(art, microbatch_wait_s=0.3)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        good = _x(1, key=200)
        bad = np.zeros((1, 1, 5, 5, 2), np.float32)  # wrong H, W

        def post_status(x):
            try:
                body, _ = _post(base, x)
                return 200, np.load(io.BytesIO(body))
            except urllib.error.HTTPError as e:
                return e.code, None

        with concurrent.futures.ThreadPoolExecutor(2) as pool:
            f_good = pool.submit(post_status, good)
            f_bad = pool.submit(post_status, bad)
            code_g, out_g = f_good.result()
            code_b, out_b = f_bad.result()
        assert code_g == 200
        np.testing.assert_allclose(
            out_g, _want(params, good), rtol=0, atol=1e-5
        )
        assert code_b in (400, 500) and out_b is None
    finally:
        server.shutdown()
        model.close()


def test_graceful_shutdown_drains_inflight(tmp_path):
    """shutdown() + server_close() (the SIGTERM path in main) must let an
    in-flight /predict finish with its full 200 response — never cut the
    connection — and refuse connections afterwards."""
    import concurrent.futures
    import time
    import urllib.error

    params = init_eps_plus_linear(jax.random.PRNGKey(70), CFG)
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    art = str(tmp_path / "g.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=6, q0=2,
        batch_sizes=(2,), backend="xla", out=art,
    )
    server, model = make_server(art)
    entered = threading.Event()
    orig = model._call

    def slow_call(bs, xb):
        entered.set()
        time.sleep(0.8)  # hold the request past the shutdown below
        return orig(bs, xb)

    model._call = slow_call
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    x = _x(2, key=200)

    with concurrent.futures.ThreadPoolExecutor(1) as pool:
        fut = pool.submit(_post, base, x)
        assert entered.wait(10), "request never reached the model"
        server.shutdown()     # stop accepting (what the SIGTERM handler does)
        server.server_close()  # drain: blocks until the handler thread ends
        body, _ = fut.result(timeout=10)  # the in-flight response completed
        np.testing.assert_allclose(
            np.load(io.BytesIO(body)), _want(params, x), rtol=0, atol=1e-5
        )
    model.close()
    # new connections are refused after the drain
    with pytest.raises(urllib.error.URLError):
        _post(base, x)


def test_serve_space_sharded_artifact(tmp_path):
    """The HTTP server serves an r4 --space-devices (height-sharded)
    artifact transparently: the loader re-jits the entry over a (1, N)
    space mesh, the server's batch routing feeds it host arrays, logits
    equal the single-device forward."""
    if jax.device_count() < 3:
        pytest.skip("needs the virtual mesh")
    from dctn_tpu.models import eps_plus_linear_forward

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=6, q0=2,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(50), cfg)
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    art = str(tmp_path / "sp.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=6, q0=2,
        batch_sizes=(3,), backend="xla", space_devices=3, out=art,
    )
    server, model = make_server(art)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        with urllib.request.urlopen(f"{base}/meta") as resp:
            meta = json.loads(resp.read())
        assert meta["space_devices"] == 3
        x = _x(3, key=51)
        body, ctype = _post(base, x)
        got = np.load(io.BytesIO(body))
        want = np.asarray(
            eps_plus_linear_forward(
                params, jax.numpy.asarray(x), cfg, training=False
            )
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    finally:
        server.shutdown()
