"""L6 layer: sweep grid expansion/orchestration, plot-config generation,
dashboard rendering, TB logging helpers, micro-benchmark harness."""

import json
import os
import sys

import numpy as np
import pytest

from dctn_tpu.cli.sweep import expand_grid, config_to_argv, run_sweep
from dctn_tpu.viz.make_plot_config import make_plot_config, split_shared_varying
from dctn_tpu.viz.plotting import render_dashboard
from dctn_tpu.train.tb_logging import (
    MetricsWriter,
    add_good_bad_bar,
    add_y_dots,
    make_image_grid,
)


def test_expand_grid_deterministic_shuffle():
    base = {"batch-size": 32}
    grid = {"lr": [1e-3, 1e-4], "reg-coeff": [0.0, 1e-6]}
    c1 = expand_grid(base, grid, shuffle_seed=0)
    c2 = expand_grid(base, grid, shuffle_seed=0)
    assert c1 == c2 and len(c1) == 4
    assert all(c["batch-size"] == 32 for c in c1)
    assert {(c["lr"], c["reg-coeff"]) for c in c1} == {
        (1e-3, 0.0), (1e-3, 1e-6), (1e-4, 0.0), (1e-4, 1e-6)
    }


def test_config_to_argv():
    argv = config_to_argv({"lr": 1e-3, "es-val-acc": False, "nu-per-channel": (1, 2, 3)})
    assert argv[:3] == [sys.executable, "-m", "dctn_tpu.cli.runner"]
    assert "--lr" in argv and "0.001" in argv
    assert "--no-es-val-acc" in argv
    i = argv.index("--nu-per-channel")
    assert argv[i + 1 : i + 4] == ["1", "2", "3"]


def test_run_sweep_with_failures(tmp_path):
    """Use tiny python -c subprocesses by monkeypatching config_to_argv via a
    config the runner can't parse → nonzero exit is recorded, sweep continues."""
    import dctn_tpu.cli.sweep as sweep_mod

    orig = sweep_mod.config_to_argv
    try:
        sweep_mod.config_to_argv = lambda cfg: [
            sys.executable, "-c", f"import sys; sys.exit({cfg['code']})"
        ]
        results = sweep_mod.run_sweep(
            [{"code": 0}, {"code": 3}, {"code": 0}], num_workers=2, poll_interval=0.05
        )
    finally:
        sweep_mod.config_to_argv = orig
    codes = sorted(code for _, code in results)
    assert codes == [0, 0, 3]


def _make_fake_experiment(root, name, lr):
    d = os.path.join(root, name)
    os.makedirs(d)
    with open(os.path.join(d, "run_info.txt"), "w") as f:
        json.dump({"lr": lr, "batch_size": 128, "output_dir": d, "commit": "x"}, f)
    with open(os.path.join(d, "log.log"), "w") as f:
        for i, (tr, v) in enumerate([(0.9, 1.0), (0.5, 0.7), (0.3, 0.6)]):
            f.write(
                f"... - INFO - After {i*100:07d} iters: train/val "
                f"mean_ce={tr:.5f}/{v:.5f} acc={50+i*10:.2f}%/{45+i*10:.2f}% "
                f"reg_term=1.00e-01\n"
            )
    return d


def test_plot_config_and_dashboard(tmp_path):
    root = str(tmp_path)
    _make_fake_experiment(root, "exp_a", 1e-3)
    _make_fake_experiment(root, "exp_b", 1e-4)
    cfg = make_plot_config(root, title="demo")
    assert cfg["shared_hyperparameters"]["batch_size"] == 128
    assert cfg["varying_hyperparameters"] == ["lr"]
    assert len(cfg["experiments"]) == 2
    assert set(cfg["experiments"]) == {"lr=0.001", "lr=0.0001"}
    out = os.path.join(root, "dash.html")
    render_dashboard(cfg, out)
    content = open(out).read()
    assert "data:image/png;base64" in content and "lr=0.001" in content


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.add_scalar("loss", 1.5, 10)
    w.add_histogram("probs", np.array([0.1, 0.9]), 10)
    w.close()
    lines = [json.loads(l) for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert lines[0] == {"tag": "loss", "value": 1.5, "step": 10}
    assert lines[1]["hist_max"] == 0.9


def test_image_annotations():
    img = np.zeros((10, 8), np.float32)
    out = add_good_bad_bar(img, 0.5)
    assert out.shape == (3, 10, 10)
    # bottom half of the bar green, top half red
    assert out[1, 9, 8] == 1.0 and out[0, 9, 8] == 0.0
    assert out[0, 0, 8] == 1.0 and out[1, 0, 8] == 0.0
    dotted = add_y_dots(out, 3)
    assert (dotted[:, 0, 0] == (0.0, 0.0, 1.0)).all()
    grid = make_image_grid([out, out, out], nrow=2)
    assert grid.shape[0] == 3 and grid.shape[1] > 10


def test_benchmark_harness():
    import jax.numpy as jnp
    from dctn_tpu.utils.benchmark import benchmark_jax

    res = benchmark_jax(
        lambda a: jnp.tanh(a @ a), (jnp.ones((32, 32)),), num_iterations=3, warmup=1
    )
    assert res["forward_seconds_per_iteration"] > 0
    assert res["forward_backward_seconds_per_iteration"] > 0


def test_interactive_dashboard(tmp_path):
    """The zero-dependency interactive dashboard (viz.interactive): one
    standalone HTML with embedded record data, three canvases, linked
    iteration sliders, hover tooltips and config panes (the Bokeh-dashboard
    analog, plot_training.py:25-239)."""
    from dctn_tpu.viz.interactive import render_interactive_dashboard

    root = str(tmp_path)
    _make_fake_experiment(root, "exp_a", 1e-3)
    _make_fake_experiment(root, "exp_b", 1e-4)
    cfg = make_plot_config(root, title="demo")
    out = os.path.join(root, "idash.html")
    render_interactive_dashboard(cfg, out)
    content = open(out).read()
    data = json.loads(
        content.split("const DATA = ", 1)[1].split(";\n", 1)[0]
    )
    assert set(data["experiments"]) == {"lr=0.001", "lr=0.0001"}
    recs = data["experiments"]["lr=0.001"]["records"]
    assert len(recs) == 3 and recs[1]["nitd"] == 100
    assert recs[1]["vacc"] == 0.55 and recs[1]["trmce"] == 0.5
    for piece in ('id="c0"', 'id="c1"', 'id="c2"', 'id="lo"', 'id="hi"',
                  "tooltip", "run_info"):
        assert piece in content
