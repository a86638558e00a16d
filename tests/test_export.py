"""Deployment-artifact tests: jax.export roundtrip of the serving forward.

The artifact must reproduce the in-process forward exactly (same lowering,
same constants) and be loadable through the package-free ``load_artifact``
path. The reference has no analog (SURVEY §2.2 — entry points end at
training scripts); this covers the framework's serving-export addition.
"""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from dctn_tpu.cli.export import (
    export_forward,
    load_artifact,
    run as export_run,
    write_artifact,
)
from dctn_tpu.models import (
    EPSesPlusLinearConfig,
    eps_plus_linear_forward,
    init_eps_plus_linear,
)
from dctn_tpu.train import save_pytree

CFG = EPSesPlusLinearConfig(
    epses_specs=((2, 4),), image_size=6, q0=2, num_classes=10,
)


def _x(bs: int, key=0) -> jax.Array:
    return (
        jax.random.uniform(jax.random.PRNGKey(key), (1, bs, 6, 6, 2))
        .astype(jnp.float32)
        * 1.4
    )


def test_export_roundtrip_matches_forward(tmp_path):
    params = init_eps_plus_linear(jax.random.PRNGKey(1), CFG)
    serialized = export_forward(params, CFG, batch_sizes=(3,))
    path = str(tmp_path / "model.dctnx")
    write_artifact(path, serialized, {"batch_sizes": [3]})
    meta, fns = load_artifact(path)
    assert set(fns) == {3} and meta["batch_sizes"] == [3]
    x = _x(3)
    got = np.asarray(fns[3](x))
    want = np.asarray(eps_plus_linear_forward(params, x, CFG, training=False))
    assert got.shape == (3, 10)
    np.testing.assert_array_equal(got, want)  # identical lowering + constants


def test_export_conv_sbs_family(tmp_path):
    """The legacy ConvSBS family exports and serves exactly too."""
    from dctn_tpu.cli.export import export_conv_sbs_forward
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        conv_sbs_model_forward,
        init_conv_sbs_model,
    )

    cfg = ConvSBSModelConfig(num_sbs_layers=2, bond_dim_size=3)
    params = init_conv_sbs_model(jax.random.PRNGKey(4), cfg)
    serialized = export_conv_sbs_forward(
        params, cfg, batch_sizes=(2,), image_size=8
    )
    path = str(tmp_path / "legacy.dctnx")
    write_artifact(path, serialized, {"model_family": "conv_sbs"})
    meta, fns = load_artifact(path)
    assert meta["model_family"] == "conv_sbs"
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 8, 8)).astype(jnp.float32)
    got = np.asarray(fns[2](x))
    want = np.asarray(conv_sbs_model_forward(params, cfg, x))
    assert got.shape == (2, 10)
    np.testing.assert_array_equal(got, want)


def test_export_fast_pipeline_exactness_interpret(tmp_path):
    """Numerical evidence for the fast-path export without a chip: under
    interpret-mode Pallas the cmt pipeline lowers to pure jax ops, exports,
    and must match the reference-layout forward to f32 epsilon (the on-chip
    analog is checked by experiments/serving_latency.py)."""
    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=8, q0=2,
        eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(10), cfg)
    serialized = export_forward(params, cfg, batch_sizes=(4,))
    path = str(tmp_path / "fast.dctnx")
    write_artifact(path, serialized, {"batch_sizes": [4]})
    _, fns = load_artifact(path)
    x = (
        jax.random.uniform(jax.random.PRNGKey(11), (1, 4, 8, 8, 2))
        .astype(jnp.float32)
        * 1.4
    )
    got = np.asarray(fns[4](x))
    ref_cfg = EPSesPlusLinearConfig(epses_specs=((2, 4),), image_size=8, q0=2)
    want = np.asarray(
        eps_plus_linear_forward(params, x, ref_cfg, training=False)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_export_with_tuned_splits_matches_reference(tmp_path):
    """Serving-split override (export --autotune-splits bakes these): a
    non-default per-layer matmul split re-matricizes the same cores, so the
    exported forward still matches the reference layout to f32 epsilon, and
    run() records the picks in meta.json."""
    from dctn_tpu.ops.eps import split_candidates
    from dctn_tpu.models.eps_plus_linear import fast_layer_plans

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=8, q0=2,
        eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(10), cfg)
    default_n1 = fast_layer_plans(cfg)[0]["n1"]
    alt = [c for c in split_candidates(4, 2) if c != default_n1][0]
    serialized = export_forward(params, cfg, batch_sizes=(4,), splits=(alt,))
    path = str(tmp_path / "tuned.dctnx")
    write_artifact(path, serialized, {"batch_sizes": [4]})
    _, fns = load_artifact(path)
    x = (
        jax.random.uniform(jax.random.PRNGKey(11), (1, 4, 8, 8, 2))
        .astype(jnp.float32)
        * 1.4
    )
    got = np.asarray(fns[4](x))
    ref_cfg = EPSesPlusLinearConfig(epses_specs=((2, 4),), image_size=8, q0=2)
    want = np.asarray(
        eps_plus_linear_forward(params, x, ref_cfg, training=False)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    # CLI path: --autotune-splits runs the fwd-only tuner and records picks
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    out = str(tmp_path / "tuned_cli.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=8, q0=2,
        batch_sizes=(4,), backend="pallas", platforms=("tpu",),
        autotune_splits=True, out=out,
    )
    with zipfile.ZipFile(out) as zf:
        meta = json.loads(zf.read("meta.json"))
    picks = meta["autotuned_splits"]
    assert len(picks) == 1 and picks[0] in split_candidates(4, 2)


def test_export_tpu_platform_lowers_pallas_from_cpu_host():
    """Cross-platform export: the fused Pallas (fast cmt) pipeline lowers for
    TPU on a CPU-only host — deployment artifacts can be built off-device."""
    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=6, q0=2, eval_backend="pallas",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(3), CFG)
    serialized = export_forward(
        params, cfg, batch_sizes=(4,), platforms=("tpu",)
    )
    blob = serialized[4]
    assert len(blob) > 10_000  # a real lowered module, not a stub
    # it is a TPU module: deserializing records the platform
    from jax import export as jax_export

    exported = jax_export.deserialize(bytearray(blob))
    assert exported.platforms == ("tpu",)


def test_export_sharded_forward_8device_mesh(tmp_path):
    """Multi-chip serving artifact: data-sharded global-batch forward over
    the virtual 8-device mesh, bit-compatible with the single-device path."""
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from dctn_tpu.cli.export import export_sharded_forward

    params = init_eps_plus_linear(jax.random.PRNGKey(6), CFG)
    blob = export_sharded_forward(
        params, CFG, global_batch=16, mesh_devices=8
    )
    path = str(tmp_path / "pod.dctnx")
    write_artifact(path, {16: blob}, {"mesh_devices": 8, "batch_sizes": [16]})
    meta, fns = load_artifact(path)
    assert meta["mesh_devices"] == 8
    x = _x(16, key=7)
    got = np.asarray(fns[16](x))
    want = np.asarray(eps_plus_linear_forward(params, x, CFG, training=False))
    assert got.shape == (16, 10)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_export_multi_platform_artifact(tmp_path):
    """A tpu+cpu artifact must auto-select the universal XLA forward
    (Mosaic custom calls only lower for TPU) and still execute here."""
    params = init_eps_plus_linear(jax.random.PRNGKey(9), CFG)
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    out = str(tmp_path / "multi.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=6, q0=2,
        batch_sizes=(3,), platforms=("tpu", "cpu"), out=out,
    )
    meta, fns = load_artifact(out)
    assert meta["backend"] == "xla" and meta["platforms"] == ["tpu", "cpu"]
    logits = np.asarray(fns[3](_x(3, key=9)))
    assert logits.shape == (3, 10) and np.isfinite(logits).all()


def test_predict_serves_from_artifact(tmp_path):
    """cli/predict accepts a deployment artifact in place of a checkpoint:
    model config + weights come from the artifact, predictions equal the
    checkpoint-based run's."""
    from dctn_tpu.cli.predict import run as predict_run

    sizes = (32, 16, 16)
    cfg = EPSesPlusLinearConfig(epses_specs=((2, 4),), image_size=28, q0=2)
    params = init_eps_plus_linear(jax.random.PRNGKey(8), cfg)
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    art = str(tmp_path / "model.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=28, q0=2,
        batch_sizes=(8,), backend="xla", out=art,
    )
    common = dict(ds_type="mnist", ds_path="synthetic", split="test",
                  batch_size=8, synthetic_sizes=sizes)
    from_ckpt = predict_run(checkpoint=ckpt, epses_specs=((2, 4),), **common)
    from_art = predict_run(checkpoint=art, **common)
    np.testing.assert_array_equal(from_art, from_ckpt)


def test_runner_export_artifact_flag(tmp_path):
    """--export-artifact: training ends with a servable deployment artifact
    of the FINAL params."""
    from dctn_tpu.cli.runner import run as runner_run
    from dctn_tpu.data import load_dataset

    sizes = (128, 64, 64)
    art = str(tmp_path / "trained.dctnx")
    state = runner_run(
        experiments_dir=str(tmp_path / "exp"),
        ds_type="fashionmnist", ds_path="synthetic",
        epses_specs=((2, 4),), batch_size=16, optimizer_name="adam",
        init_epses_composition_unit_theoretical_output_std=True,
        lr=3e-3, eval_schedule=((None, 10),), max_num_iters=10,
        keep_last_models=1, synthetic_sizes=sizes, patience=50,
        reg_coeff=1e-6,
        export_artifact=art, export_batch_sizes="1,8",
    )
    meta, fns = load_artifact(art)
    assert meta["batch_sizes"] == [1, 8] and meta["model_family"] == "eps"
    splits = load_dataset("fashionmnist", "synthetic",
                          autoscale_kernel_size=2, synthetic_sizes=sizes)
    x = jnp.asarray(splits.test.x[:, :8]).astype(jnp.float32)
    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=x.shape[2], q0=x.shape[-1],
    )
    got = np.asarray(fns[8](x))
    want = np.asarray(
        eps_plus_linear_forward(state.params, x, cfg, training=False)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_legacy_runner_export_artifact_flag(tmp_path):
    """The legacy ConvSBS runner's --export-artifact produces a servable
    artifact equal to the final cores' forward."""
    from dctn_tpu.cli.legacy_runner import run as legacy_run
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        conv_sbs_model_forward,
    )

    art = str(tmp_path / "legacy_trained.dctnx")
    params, _ = legacy_run(
        ds_path="synthetic", models_dir=str(tmp_path / "models"),
        num_sbs_layers=2, bond_dim_size=2,
        initialization="khrulkov-normal", learning_rate=1e-3,
        optimizer_type="sgd", batch_size=32, epochs=1,
        warmup_num_epochs=1, synthetic_sizes=(64, 32), seed=0,
        export_artifact=art, export_batch_sizes="4",
    )
    meta, fns = load_artifact(art)
    assert meta["model_family"] == "conv_sbs" and meta["batch_sizes"] == [4]
    cfg = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=2,
        input_multiplier=meta["input_multiplier"],
    )
    x = jax.random.uniform(
        jax.random.PRNGKey(3), (4, meta["image_size"], meta["image_size"])
    ).astype(jnp.float32)
    got = np.asarray(fns[4](x))
    want = np.asarray(conv_sbs_model_forward(params, cfg, x))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_export_cli_end_to_end(tmp_path):
    params = init_eps_plus_linear(jax.random.PRNGKey(2), CFG)
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    out = str(tmp_path / "model.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 4),), image_size=6, q0=2,
        batch_sizes=(2, 5), backend="xla", out=out,
    )
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
        meta = json.loads(zf.read("meta.json"))
    assert names == {"meta.json", "forward_bs2.jaxexp", "forward_bs5.jaxexp"}
    assert meta["epses_specs"] == [[2, 4]] and meta["backend"] == "xla"
    _, fns = load_artifact(out)
    for bs in (2, 5):
        logits = np.asarray(fns[bs](_x(bs, key=bs)))
        assert logits.shape == (bs, 10) and np.isfinite(logits).all()
    # the artifact embeds the weights: same input → same logits as in-process
    want = np.asarray(
        eps_plus_linear_forward(params, _x(2, key=2), CFG, training=False)
    )
    np.testing.assert_array_equal(np.asarray(fns[2](_x(2, key=2))), want)


def test_export_quantized_int8_roundtrip(tmp_path):
    """--quantize int8: the exported artifact reproduces the in-process W8A8
    forward exactly (same lowering + baked int8 constants), records its
    quantize mode in meta, and its logits track the f32 forward within the
    quantization-noise budget."""
    from dctn_tpu.models.eps_plus_linear import (
        fast_layer_plans,
        fast_params_from_reference,
    )
    from dctn_tpu.pallas.eps_pallas_q8 import (
        forward_fast_q8,
        quantize_fast_params,
    )

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4), (2, 6)), image_size=8, q0=2,
        eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(20), cfg)
    serialized = export_forward(
        params, cfg, batch_sizes=(4,), quantize="int8"
    )
    path = str(tmp_path / "q8.dctnx")
    write_artifact(path, serialized, {"batch_sizes": [4], "quantize": "int8"})
    meta, fns = load_artifact(path)
    assert meta["quantize"] == "int8"
    x = (
        jax.random.uniform(jax.random.PRNGKey(21), (1, 4, 8, 8, 2))
        .astype(jnp.float32)
        * 1.4
    )
    got = np.asarray(fns[4](x))
    fast, plans = fast_params_from_reference(params, cfg)
    qparams = quantize_fast_params(fast, plans)
    want = np.asarray(forward_fast_q8(qparams, x, cfg, plans, interpret=True))
    np.testing.assert_array_equal(got, want)  # identical lowering + constants
    f32 = np.asarray(eps_plus_linear_forward(
        params, x,
        EPSesPlusLinearConfig(epses_specs=((2, 4), (2, 6)), image_size=8, q0=2),
        training=False,
    ))
    rel = np.linalg.norm(got - f32) / np.linalg.norm(f32)
    assert rel < 0.05, rel


def test_export_quantized_cli_validation(tmp_path):
    """--quantize composes only with the eps family + pallas backend."""
    import click
    import pytest as _pytest

    params = init_eps_plus_linear(jax.random.PRNGKey(22), CFG)
    ckpt = str(tmp_path / "m.npz")
    save_pytree(params, ckpt)
    with _pytest.raises(click.UsageError, match="pallas"):
        export_run(
            checkpoint=ckpt, epses_specs=CFG.epses_specs, image_size=6,
            batch_sizes=(2,), backend="xla", quantize="int8",
            out=str(tmp_path / "bad.dctnx"),
        )
    with _pytest.raises(click.UsageError, match="mutually exclusive"):
        export_run(
            checkpoint=ckpt, epses_specs=CFG.epses_specs, image_size=6,
            batch_sizes=(2,), backend="pallas_interpret", quantize="int8",
            compute_dtype="bfloat16", out=str(tmp_path / "bad2.dctnx"),
        )
    # int8 is an MXU-rate play; the ConvSBS family is VPU-bound bond folds
    # with nothing to quantize (docs/deployment.md) — refused, not silent
    with _pytest.raises(click.UsageError, match="VPU-bound"):
        export_run(
            checkpoint=ckpt, model_family="conv_sbs", image_size=6,
            batch_sizes=(2,), backend="pallas_interpret", quantize="int8",
            out=str(tmp_path / "bad3.dctnx"),
        )

def test_export_sharded_forward_int8_8device_mesh(tmp_path):
    """Multi-chip int8 serving: `--mesh-devices N --quantize int8` compose —
    the data-sharded entry runs the same W8A8 kernels per shard, and batch
    sharding is exact (per-pixel dynamic activation quant; batch is the
    matmul's N dim, never a reduction)."""
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from dctn_tpu.cli.export import export_sharded_forward
    from dctn_tpu.models.eps_plus_linear import (
        fast_params_from_reference,
    )
    from dctn_tpu.pallas.eps_pallas_q8 import (
        forward_fast_q8,
        quantize_fast_params,
    )

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=6, q0=2,
        eval_backend="pallas_interpret",
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(30), cfg)
    blob = export_sharded_forward(
        params, cfg, global_batch=16, mesh_devices=8, quantize="int8"
    )
    path = str(tmp_path / "pod_q8.dctnx")
    write_artifact(path, {16: blob},
                   {"mesh_devices": 8, "batch_sizes": [16],
                    "quantize": "int8"})
    meta, fns = load_artifact(path)
    assert meta["quantize"] == "int8"
    x = _x(16, key=31)
    got = np.asarray(fns[16](x))
    fast, plans = fast_params_from_reference(params, cfg)
    qparams = quantize_fast_params(fast, plans)
    want = np.asarray(forward_fast_q8(qparams, x, cfg, plans, interpret=True))
    assert got.shape == (16, 10)
    np.testing.assert_array_equal(got, want)


def test_runner_export_quantized_artifact(tmp_path):
    """--export-quantize int8: the runner's end-of-training export bakes the
    W8A8 kernels; the artifact equals the in-process q8 forward of the final
    params and tracks the f32 logits within the quantization-noise budget."""
    from dctn_tpu.cli.runner import run as runner_run
    from dctn_tpu.data import load_dataset
    from dctn_tpu.models.eps_plus_linear import (
        fast_params_from_reference,
        reference_params_from_fast,
        fast_layer_plans,
    )
    from dctn_tpu.pallas.eps_pallas_q8 import (
        forward_fast_q8,
        quantize_fast_params,
    )

    sizes = (128, 64, 64)
    art = str(tmp_path / "trained_q8.dctnx")
    state = runner_run(
        experiments_dir=str(tmp_path / "exp"),
        ds_type="fashionmnist", ds_path="synthetic",
        epses_specs=((2, 4),), batch_size=16, optimizer_name="adam",
        init_epses_composition_unit_theoretical_output_std=True,
        lr=3e-3, eval_schedule=((None, 10),), max_num_iters=10,
        keep_last_models=1, synthetic_sizes=sizes, patience=50,
        reg_coeff=1e-6,
        train_backend="pallas_interpret", eval_backend="pallas_interpret",
        export_artifact=art, export_batch_sizes="8",
        export_quantize="int8",
    )
    meta, fns = load_artifact(art)
    assert meta["quantize"] == "int8" and meta["batch_sizes"] == [8]
    splits = load_dataset("fashionmnist", "synthetic",
                          autoscale_kernel_size=2, synthetic_sizes=sizes)
    x = jnp.asarray(splits.test.x[:, :8]).astype(jnp.float32)
    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 4),), image_size=x.shape[2], q0=x.shape[-1],
        eval_backend="pallas_interpret", train_backend="pallas_interpret",
    )
    final = state.params
    if "epses_cmt" in final:
        final = reference_params_from_fast(
            final, cfg, fast_layer_plans(cfg, 1)
        )
    fast, plans = fast_params_from_reference(final, cfg)
    qparams = quantize_fast_params(fast, plans)
    got = np.asarray(fns[8](x))
    want = np.asarray(forward_fast_q8(qparams, x, cfg, plans, interpret=True))
    np.testing.assert_array_equal(got, want)
    f32 = np.asarray(eps_plus_linear_forward(final, x, cfg, training=False))
    rel = np.linalg.norm(got - f32) / np.linalg.norm(f32)
    assert rel < 0.05, rel


def test_runner_export_quantize_validation(tmp_path):
    """--export-quantize fails fast (before training) without an artifact
    path or with a non-pallas eval backend."""
    import click
    import pytest as _pytest

    from dctn_tpu.cli.runner import run as runner_run

    common = dict(
        ds_type="fashionmnist", ds_path="synthetic",
        epses_specs=((2, 4),), batch_size=16, optimizer_name="adam",
        init_epses_composition_unit_theoretical_output_std=True,
        lr=3e-3, eval_schedule=((None, 10),), max_num_iters=10,
        keep_last_models=1, synthetic_sizes=(64, 32, 32), patience=50,
    )
    with _pytest.raises(click.UsageError, match="export-artifact"):
        runner_run(experiments_dir=str(tmp_path / "e1"),
                   export_quantize="int8", **common)
    with _pytest.raises(click.UsageError, match="pallas"):
        runner_run(experiments_dir=str(tmp_path / "e2"),
                   export_quantize="int8",
                   export_artifact=str(tmp_path / "a.dctnx"),
                   eval_backend="xla", train_backend="xla", **common)


def test_export_space_sharded_forward(tmp_path):
    """HEIGHT-sharded serving artifact (r4 — the SP training mesh's serving
    twin): the exported entry shards the image height over a space mesh,
    runs the per-layer halo exchange inside, and matches the single-device
    forward exactly. Exercises the full CLI path incl. meta + loader."""
    import pytest

    if jax.device_count() < 4:
        pytest.skip("needs the virtual mesh")
    from dctn_tpu.cli.export import run as export_run

    cfg = EPSesPlusLinearConfig(
        epses_specs=((2, 3), (2, 4)), image_size=6, q0=2, num_classes=10,
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(11), cfg)
    ckpt = str(tmp_path / "ckpt.npz")
    save_pytree(params, ckpt)
    art = str(tmp_path / "sp.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        batch_sizes=(8,), space_devices=3, backend="xla", out=art,
    )
    meta, fns = load_artifact(art)
    assert meta["space_devices"] == 3 and meta["mesh_devices"] == 1
    x = (
        jax.random.uniform(jax.random.PRNGKey(12), (1, 8, 6, 6, 2))
        .astype(jnp.float32)
        * 1.4
    )
    got = np.asarray(fns[8](x))
    want = np.asarray(eps_plus_linear_forward(params, x, cfg, training=False))
    assert got.shape == (8, 10)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    # the fast (cmt) Pallas pipeline lowers inside the space shard_map too
    art2 = str(tmp_path / "sp_fast.dctnx")
    export_run(
        checkpoint=ckpt, epses_specs=((2, 3), (2, 4)), image_size=6, q0=2,
        batch_sizes=(8,), space_devices=3, backend="pallas_interpret",
        out=art2,
    )
    _meta2, fns2 = load_artifact(art2)
    got2 = np.asarray(fns2[8](x))
    np.testing.assert_allclose(got2, want, rtol=1e-5, atol=1e-5)

    # validations: quantize / mesh-devices / indivisible height refused
    import click

    for kw, msg in (
        (
            dict(space_devices=3, quantize="int8",
                 backend="pallas_interpret"),
            "does not compose",
        ),
        (dict(space_devices=3, mesh_devices=2, backend="xla"),
         "mutually exclusive"),
        (dict(space_devices=4, backend="xla"), "divisible"),
    ):
        with pytest.raises(click.UsageError, match=msg):
            export_run(
                checkpoint=ckpt, epses_specs=((2, 3), (2, 4)), image_size=6,
                q0=2, batch_sizes=(8,),
                out=str(tmp_path / "bad.dctnx"), **kw,
            )
