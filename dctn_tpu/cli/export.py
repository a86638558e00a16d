"""Model export for deployment: serialize the jitted serving forward into a
portable StableHLO artifact and reload it anywhere.

The reference has no deployment surface at all — its entry points end at
training scripts and ad-hoc evaluation
(``small_experiments/pre_publishing_test_evaluation/*.py``); this module is
the TPU-native production complement to ``cli/predict.py``: one
self-contained file that embeds the trained weights as constants plus the
lowered forward (the fused Mosaic kernels when exported for TPU, the XLA
forward elsewhere), loadable in any jax-capable server process **without the
dctn_tpu package installed**. Both model families export: EPSesPlusLinear
(``--model-family eps``) and the legacy ConvSBS stack (``conv_sbs``).

Artifact layout (a zip):
  meta.json          — model config echo, batch sizes, platforms, dtype
  forward_bs{N}.jaxexp — ``jax.export`` serialization, one per batch size
                          (static shapes keep the TPU kernels eligible)

Usage:
  python -m dctn_tpu.cli.export CKPT.npz --epses-specs "(4,4),(3,6)" \
      --image-size 28 --q0 2 --batch-sizes 1,128 --out model.dctnx
  # serving side (no dctn_tpu needed):
  #   from dctn_tpu.cli.export import load_artifact   # or inline the short
  #   meta, fns = load_artifact("model.dctnx")        # loader — it only uses
  #   logits = fns[128](x)                            # jax.export + zipfile
"""

from __future__ import annotations

import json
import zipfile
from typing import Dict, Optional, Sequence, Tuple

import click
import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..models import EPSesPlusLinearConfig, init_eps_plus_linear
from ..train import load_pytree
from .predict import _resolve_forward
from .runner import parse_epses_specs

_META_NAME = "meta.json"


def export_forward(
    params,
    cfg: EPSesPlusLinearConfig,
    *,
    batch_sizes: Sequence[int],
    channels: int = 1,
    platforms: Optional[Sequence[str]] = None,
    in_dtype=jnp.float32,
    splits=None,
    quantize=None,
) -> Dict[int, bytes]:
    """Serialize the serving forward (weights baked in as constants) for each
    batch size. Static batch shapes — symbolic dims would disqualify the
    Mosaic kernels — so export every batch size the server will use.
    ``splits``: optional per-layer matmul splits (see _resolve_forward);
    ``quantize="int8"``: bake W8A8-quantized EPS layers (int8 weights — the
    artifact shrinks ~4× — and ~2× the MXU rate on v5e)."""
    fparams, forward_fn = _resolve_forward(params, cfg, splits, quantize)
    serialized: Dict[int, bytes] = {}
    for bs in batch_sizes:
        fn = jax.jit(lambda xb: forward_fn(fparams, xb))
        spec = jax.ShapeDtypeStruct(
            (channels, bs, cfg.image_size, cfg.image_size, cfg.q0), in_dtype
        )
        exported = jax_export.export(
            fn, platforms=None if platforms is None else tuple(platforms)
        )(spec)
        serialized[bs] = bytes(exported.serialize())
    return serialized


def export_sharded_forward(
    params,
    cfg: EPSesPlusLinearConfig,
    *,
    global_batch: int,
    mesh_devices: int,
    channels: int = 1,
    platforms: Optional[Sequence[str]] = None,
    in_dtype=jnp.float32,
    splits=None,
    quantize=None,
) -> bytes:
    """Multi-chip serving export: one entry point taking the GLOBAL batch,
    data-sharded over a ``mesh_devices``-device mesh (weights baked in and
    replicated). jax.export records the device assignment + shardings, so
    the artifact must be built on (or with the same device count as) the
    serving topology — e.g. build on the v5e-8 pod it will serve on, or on
    a virtual CPU mesh of matching size for testing."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import make_mesh

    if global_batch % mesh_devices:
        raise ValueError(
            f"global batch {global_batch} is not divisible by "
            f"mesh_devices={mesh_devices}"
        )
    mesh = make_mesh(mesh_devices)
    fparams, forward_fn = _resolve_forward(params, cfg, splits, quantize)

    sharded = jax.shard_map(
        lambda xs: forward_fn(fparams, xs),
        mesh=mesh,
        in_specs=P(None, "data"),
        out_specs=P("data"),
        check_vma=False,
    )
    fn = jax.jit(
        sharded,
        in_shardings=NamedSharding(mesh, P(None, "data")),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    spec = jax.ShapeDtypeStruct(
        (channels, global_batch, cfg.image_size, cfg.image_size, cfg.q0),
        in_dtype,
    )
    exported = jax_export.export(
        fn, platforms=None if platforms is None else tuple(platforms)
    )(spec)
    return bytes(exported.serialize())


def export_space_sharded_forward(
    params,
    cfg: EPSesPlusLinearConfig,
    *,
    batch_size: int,
    space_devices: int,
    channels: int = 1,
    platforms: Optional[Sequence[str]] = None,
    in_dtype=jnp.float32,
    splits=None,
) -> bytes:
    """HEIGHT-sharded serving export (the SP mesh's serving twin): one
    entry point taking the full (C, B, H, W, Q) batch with the image
    height sharded over ``space_devices`` — for inputs whose per-image
    activations (B·H·W·Q^n1 Khatri-Rao intermediates) exceed one chip's
    HBM, the same scaling axis ``--space-devices`` training uses
    (parallel/spatial_parallel.py: per-layer nearest-neighbor halo
    ppermute, classifier masked by construction, one logits psum).
    Weights are baked in and replicated. The image height must divide the
    space axis (the exported module carries no pad), and quantize is not
    supported (the W8A8 serving kernels plan per full image)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import make_sp_mesh
    from ..parallel.spatial_parallel import (
        _sp_fast_forward_local,
        _sp_forward_local,
        sp_check_config,
    )

    if cfg.image_size % space_devices:
        raise ValueError(
            f"image height {cfg.image_size} is not divisible by "
            f"space_devices={space_devices} (the exported module carries "
            "no height pad)"
        )
    mesh = make_sp_mesh(1, space_devices)
    hl = sp_check_config(cfg, space_devices)

    # resolve the fast (cmt) layout exactly like the single-chip export
    # path (predict._resolve_forward's fast branch), reference layout
    # otherwise
    fast = plans = None
    if cfg.eval_backend in ("pallas", "pallas_interpret"):
        from ..models.eps_plus_linear import (
            FastLayoutUnavailable,
            fast_layer_plans,
            fast_params_from_reference,
        )

        try:
            plans = fast_layer_plans(cfg, channels)
            if splits is not None:
                plans = tuple(
                    {**p, "n1": n1} for p, n1 in zip(plans, splits)
                )
            fast, plans = fast_params_from_reference(params, cfg, plans=plans)
        except FastLayoutUnavailable:
            plans = None

    if plans is not None:
        local = lambda xb: _sp_fast_forward_local(  # noqa: E731
            fast, xb, cfg, plans, False, None, space_devices, hl
        )
    else:
        local = lambda xb: _sp_forward_local(  # noqa: E731
            params, xb, cfg, False, None, space_devices, hl
        )
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, "data", "space"),
        out_specs=P("data"),
        check_vma=False,
    )
    fn = jax.jit(
        sharded,
        in_shardings=NamedSharding(mesh, P(None, "data", "space")),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    spec = jax.ShapeDtypeStruct(
        (channels, batch_size, cfg.image_size, cfg.image_size, cfg.q0),
        in_dtype,
    )
    exported = jax_export.export(
        fn, platforms=None if platforms is None else tuple(platforms)
    )(spec)
    return bytes(exported.serialize())


def export_conv_sbs_forward(
    params,
    cfg,
    *,
    batch_sizes: Sequence[int],
    image_size: int = 28,
    platforms: Optional[Sequence[str]] = None,
    in_dtype=jnp.float32,
) -> Dict[int, bytes]:
    """ConvSBS (legacy family) serving export: raw (bs, H, W) pixels →
    (bs, num_labels) logits, the quantum map baked into the module
    (mnist.py:255-263 semantics — the reference model this family replaces)."""
    from ..models.conv_sbs_model import conv_sbs_model_forward

    serialized: Dict[int, bytes] = {}
    for bs in batch_sizes:
        fn = jax.jit(lambda xb: conv_sbs_model_forward(params, cfg, xb))
        spec = jax.ShapeDtypeStruct((bs, image_size, image_size), in_dtype)
        exported = jax_export.export(
            fn, platforms=None if platforms is None else tuple(platforms)
        )(spec)
        serialized[bs] = bytes(exported.serialize())
    return serialized


def write_artifact(
    path: str,
    serialized: Dict[int, bytes],
    meta: dict,
) -> None:
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
        for bs, blob in sorted(serialized.items()):
            zf.writestr(f"forward_bs{bs}.jaxexp", blob)


def load_artifact(path: str) -> Tuple[dict, Dict[int, object]]:
    """(meta, {batch_size: callable}) — each callable maps an input batch to
    logits. Needs only jax + stdlib, not dctn_tpu. Sharded artifacts
    (``meta["mesh_devices"] > 1``) are re-jitted over the loading host's
    first N devices with the artifact's data-sharding convention — an
    exported N-device function must be invoked in an N-device context."""
    fns: Dict[int, object] = {}
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read(_META_NAME))
        n_mesh = meta.get("mesh_devices", 1)
        n_space = meta.get("space_devices", 1)
        need = max(n_mesh, n_space)
        if need > 1 and len(jax.devices()) < need:
            raise RuntimeError(
                f"sharded artifact needs {need} devices; this host has "
                f"{len(jax.devices())}"
            )
        for name in zf.namelist():
            if name == _META_NAME:
                continue
            bs = int(name[len("forward_bs") : -len(".jaxexp")])
            exported = jax_export.deserialize(bytearray(zf.read(name)))
            if n_space > 1:
                import numpy as _np
                from jax.sharding import Mesh, NamedSharding
                from jax.sharding import PartitionSpec as _P

                mesh = Mesh(
                    _np.asarray(jax.devices()[:n_space]).reshape(1, n_space),
                    ("data", "space"),
                )
                fns[bs] = jax.jit(
                    exported.call,
                    in_shardings=NamedSharding(
                        mesh, _P(None, "data", "space")
                    ),
                    out_shardings=NamedSharding(mesh, _P("data")),
                )
            elif n_mesh > 1:
                from jax.sharding import Mesh, NamedSharding
                from jax.sharding import PartitionSpec as _P

                mesh = Mesh(jax.devices()[:n_mesh], ("data",))
                fns[bs] = jax.jit(
                    exported.call,
                    in_shardings=NamedSharding(mesh, _P(None, "data")),
                    out_shardings=NamedSharding(mesh, _P("data")),
                )
            else:
                fns[bs] = exported.call
    return meta, fns


def parse_batch_sizes(s: str) -> Tuple[int, ...]:
    """'1,128' → (1, 128) — shared by export's and the runners'
    --export-batch-sizes options."""
    return tuple(int(v) for v in s.split(",") if v.strip())


def build_meta(
    *,
    model_family: str,
    image_size: int,
    batch_sizes: Sequence[int],
    backend: str,
    mesh_devices: int = 1,
    space_devices: int = 1,
    platforms: Optional[Sequence[str]] = None,
    compute_dtype: str = "float32",
    quantize: str = "none",
    **family_meta,
) -> dict:
    """The one place the artifact meta schema is assembled — export's CLI
    and both runners' --export-artifact flags all go through here so the
    schema cannot drift between producers."""
    targets = list(platforms) if platforms else [jax.default_backend()]
    return {
        "format_version": 1,
        "model_family": model_family,
        "image_size": image_size,
        "batch_sizes": sorted(batch_sizes),
        "mesh_devices": mesh_devices,
        "space_devices": space_devices,
        "platforms": targets,
        "backend": backend,
        # the compute-dtype knob exists only on the eps forward; a conv_sbs
        # artifact is always an f32 module regardless of the flag
        "compute_dtype": compute_dtype if model_family == "eps" else "float32",
        # W8A8 int8 EPS matmuls (eps family, pallas backend only)
        "quantize": quantize if model_family == "eps" else "none",
        "in_dtype": "float32",
        "jax_version": jax.__version__,
        **family_meta,
    }


def _parse_int_list(_ctx, _param, value: str) -> Tuple[int, ...]:
    return parse_batch_sizes(value)


@click.command()
@click.argument("checkpoint", type=click.Path(exists=True, dir_okay=False))
@click.option("--model-family", type=click.Choice(("eps", "conv_sbs")),
              default="eps")
@click.option("--epses-specs", type=parse_epses_specs, default=None,
              help="required for --model-family eps")
@click.option("--image-size", type=int, default=28)
@click.option("--q0", type=int, default=2)
@click.option("--channels", type=int, default=1)
@click.option("--num-classes", type=int, default=10)
@click.option("--num-sbs-layers", type=int, default=2,
              help="conv_sbs family")
@click.option("--bond-dim", type=int, default=4, help="conv_sbs family")
@click.option("--trace-edge/--no-trace-edge", default=False,
              help="conv_sbs family")
@click.option("--cos-sin-squared", is_flag=True, help="conv_sbs family")
@click.option("--input-multiplier", type=float, default=1.0,
              help="conv_sbs family")
@click.option("--batch-sizes", callback=_parse_int_list, default="1,128",
              help="comma-separated; one exported entry point per size "
                   "(GLOBAL batch when --mesh-devices > 1)")
@click.option("--mesh-devices", type=int, default=1,
              help="export a data-sharded forward over a mesh of this many "
                   "devices (eps family; build on the serving topology)")
@click.option("--space-devices", type=int, default=1,
              help="export a HEIGHT-sharded forward over a space mesh of "
                   "this many devices (eps family) — the serving twin of "
                   "--space-devices training, for inputs whose per-image "
                   "activations exceed one chip's HBM; exclusive with "
                   "--mesh-devices and --quantize")
@click.option("--platform", "platforms", multiple=True,
              help="target platform(s), e.g. --platform tpu --platform cpu; "
                   "default: the exporting host's platform")
@click.option("--backend", type=click.Choice(("auto", "pallas", "xla")),
              default="auto",
              help="forward implementation to lower: the fused Pallas "
                   "pipeline (TPU), plain XLA, or auto (pallas iff EVERY "
                   "target is tpu — Mosaic custom calls don't lower for "
                   "other platforms)")
@click.option("--compute-dtype", type=click.Choice(("float32", "bfloat16")),
              default="float32",
              help="MXU operand dtype baked into the artifact (eps family; "
                   "bf16 halves the resident core footprint — numerically "
                   "~free on TPU, see docs/performance.md)")
@click.option("--quantize", type=click.Choice(("none", "int8")),
              default="none",
              help="W8A8 dynamic quantization of the EPS matmuls (eps "
                   "family, pallas backend): int8 weights baked in (~4× "
                   "smaller artifact) + per-pixel dynamic activation "
                   "quantization in-kernel — ~2× the MXU rate on v5e, at "
                   "the cost of int8 rounding noise in the logits (see "
                   "docs/deployment.md for measured accuracy deltas)")
@click.option("--autotune-splits/--no-autotune-splits", default=False,
              help="measure each EPS layer's top matmul-split candidates "
                   "on this device with the SERVING objective (forward "
                   "only) at the largest batch size, and bake the fastest "
                   "into the artifact (eps family, pallas backend; exact — "
                   "splits only re-matricize the cores)")
@click.option("--autotune-cache/--no-autotune-cache", default=True,
              help="reuse --autotune-splits picks measured earlier for the "
                   "same architecture/batch/objective/device "
                   "(train/autotune.default_cache_path, override with "
                   "DCTN_TPU_AUTOTUNE_CACHE)")
@click.option("--out", type=click.Path(dir_okay=False), required=True)
def main(checkpoint, model_family, epses_specs, image_size, q0, channels,
         num_classes, num_sbs_layers, bond_dim, trace_edge, cos_sin_squared,
         input_multiplier, batch_sizes, mesh_devices, space_devices,
         platforms, backend, compute_dtype, quantize, autotune_splits,
         autotune_cache, out):
    run(checkpoint=checkpoint, model_family=model_family,
        epses_specs=epses_specs, image_size=image_size, q0=q0,
        channels=channels, num_classes=num_classes,
        num_sbs_layers=num_sbs_layers, bond_dim=bond_dim,
        trace_edge=trace_edge, cos_sin_squared=cos_sin_squared,
        input_multiplier=input_multiplier, batch_sizes=batch_sizes,
        mesh_devices=mesh_devices, space_devices=space_devices,
        platforms=platforms or None,
        backend=backend, compute_dtype=compute_dtype, quantize=quantize,
        autotune_splits=autotune_splits, autotune_cache=autotune_cache,
        out=out)


def run(*, checkpoint, model_family="eps", epses_specs=None, image_size=28,
        q0=2, channels=1, num_classes=10, num_sbs_layers=2, bond_dim=4,
        trace_edge=False, cos_sin_squared=False, input_multiplier=1.0,
        batch_sizes=(1, 128), mesh_devices=1, space_devices=1,
        platforms=None, backend="auto",
        compute_dtype="float32", quantize="none", autotune_splits=False,
        autotune_cache=True, out=None):
    targets = tuple(platforms) if platforms else (jax.default_backend(),)
    if backend == "auto":
        # Mosaic custom calls only lower for TPU — a multi-platform artifact
        # (e.g. --platform tpu --platform cpu) must take the XLA forward.
        backend = "pallas" if all(t == "tpu" for t in targets) else "xla"
    if quantize != "none":
        if model_family != "eps":
            raise click.UsageError(
                "--quantize needs --model-family eps: int8 W8A8 doubles "
                "MXU matmul rate, but the ConvSBS kernels are VPU-bound "
                "bond folds with no MXU matmul to quantize (and KB-scale "
                "cores) — see docs/deployment.md"
            )
        if backend not in ("pallas", "pallas_interpret"):
            raise click.UsageError(
                "--quantize needs the pallas backend (the W8A8 kernels live "
                "on the fast pipeline; pass --backend pallas or target tpu)"
            )
        if compute_dtype == "bfloat16":
            raise click.UsageError(
                "--quantize int8 and --compute-dtype bfloat16 are mutually "
                "exclusive: the W8A8 kernels fix their own dtypes (int8 MXU "
                "accumulating in int32, f32 elsewhere)"
            )
    if mesh_devices > 1 and model_family != "eps":
        raise click.UsageError("--mesh-devices > 1 needs --model-family eps")
    if space_devices > 1:
        if model_family != "eps":
            raise click.UsageError(
                "--space-devices > 1 needs --model-family eps"
            )
        if mesh_devices > 1:
            raise click.UsageError(
                "--space-devices and --mesh-devices are mutually exclusive "
                "in export (one sharded entry convention per artifact; "
                "shard data OR image height)"
            )
        if quantize != "none":
            raise click.UsageError(
                "--quantize int8 does not compose with --space-devices "
                "export: the W8A8 serving kernels plan per full image "
                "(use --mesh-devices or single-chip int8)"
            )
        if image_size % space_devices:
            raise click.UsageError(
                f"--image-size {image_size} must be divisible by "
                f"--space-devices {space_devices} (the exported module "
                "carries no height pad)"
            )
    if mesh_devices > 1:
        bad = [bs for bs in batch_sizes if bs % mesh_devices]
        if bad:
            raise click.UsageError(
                f"global batch sizes {bad} are not divisible by "
                f"--mesh-devices {mesh_devices}"
            )
    if model_family == "eps":
        if not epses_specs:
            raise click.UsageError("--model-family eps needs --epses-specs")
        cfg = EPSesPlusLinearConfig(
            epses_specs=epses_specs, image_size=image_size, q0=q0,
            num_classes=num_classes, eval_backend=backend,
            compute_dtype=jnp.bfloat16
            if compute_dtype == "bfloat16"
            else None,
        )
        template = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
        params = load_pytree(template, checkpoint)
        splits = None
        if autotune_splits:
            if backend not in ("pallas", "pallas_interpret"):
                raise click.UsageError(
                    "--autotune-splits needs the pallas backend (the fast "
                    "layout); it is the only path with tunable splits"
                )
            from ..train.autotune import autotune_splits as _tune

            # serving objective, tuned once at the largest (throughput)
            # entry; the per-device batch is what each chip sees. On a
            # non-TPU host (cross-compiling artifacts) the real kernels
            # can't run — measure under the interpreter and say so.
            on_tpu = jax.default_backend() == "tpu"
            if not on_tpu:
                click.echo(
                    "--autotune-splits: no TPU on this host — measuring "
                    "under interpret-mode Pallas; treat picks as "
                    "approximate (tune on the serving hardware for real "
                    "numbers)", err=True,
                )
            tune_cfg = EPSesPlusLinearConfig(
                epses_specs=epses_specs, image_size=image_size, q0=q0,
                num_classes=num_classes,
                train_backend="pallas" if on_tpu else "pallas_interpret",
                eval_backend="pallas" if on_tpu else "pallas_interpret",
                compute_dtype=cfg.compute_dtype,
            )
            tune_bs = max(batch_sizes) // max(1, mesh_devices)
            from ..train.autotune import default_cache_path

            tuned, _report = _tune(
                tune_cfg, max(1, tune_bs), channels, forward_only=True,
                quantize=None if quantize == "none" else quantize,
                log_fn=lambda m: click.echo(m, err=True),
                cache_path=default_cache_path() if autotune_cache else None,
            )
            splits = tuple(p["n1"] for p in tuned)
        q = None if quantize == "none" else quantize
        if space_devices > 1:
            serialized = {
                bs: export_space_sharded_forward(
                    params, cfg, batch_size=bs, space_devices=space_devices,
                    channels=channels, platforms=platforms, splits=splits,
                )
                for bs in batch_sizes
            }
        elif mesh_devices > 1:
            serialized = {
                bs: export_sharded_forward(
                    params, cfg, global_batch=bs, mesh_devices=mesh_devices,
                    channels=channels, platforms=platforms, splits=splits,
                    quantize=q,
                )
                for bs in batch_sizes
            }
        else:
            serialized = export_forward(
                params, cfg, batch_sizes=batch_sizes, channels=channels,
                platforms=platforms, splits=splits, quantize=q,
            )
        family_meta = {
            "epses_specs": [list(s) for s in epses_specs],
            "q0": q0,
            "channels": channels,
            "num_classes": num_classes,
        }
        if splits is not None:
            family_meta["autotuned_splits"] = list(splits)
    else:
        from ..models.conv_sbs_model import (
            ConvSBSModelConfig,
            init_conv_sbs_model,
        )

        cfg = ConvSBSModelConfig(
            num_sbs_layers=num_sbs_layers, bond_dim_size=bond_dim,
            trace_edge=trace_edge, cos_sin_squared=cos_sin_squared,
            input_multiplier=input_multiplier, num_labels=num_classes,
            backend=backend,
        )
        template = init_conv_sbs_model(jax.random.PRNGKey(0), cfg)
        params = load_pytree(template, checkpoint)
        serialized = export_conv_sbs_forward(
            params, cfg, batch_sizes=batch_sizes, image_size=image_size,
            platforms=platforms,
        )
        family_meta = {
            "num_sbs_layers": num_sbs_layers,
            "bond_dim_size": bond_dim,
            "trace_edge": trace_edge,
            "cos_sin_squared": cos_sin_squared,
            "input_multiplier": input_multiplier,
            "num_labels": num_classes,
        }
    meta = build_meta(
        model_family=model_family, image_size=image_size,
        batch_sizes=batch_sizes, backend=backend, mesh_devices=mesh_devices,
        space_devices=space_devices,
        platforms=platforms, compute_dtype=compute_dtype, quantize=quantize,
        **family_meta,
    )
    write_artifact(out, serialized, meta)
    total = sum(len(b) for b in serialized.values())
    print(
        f"exported {len(serialized)} entry point(s) "
        f"(bs {sorted(serialized)}, platforms {list(targets)}) "
        f"to {out} ({total / 1e6:.2f} MB)"
    )


if __name__ == "__main__":
    main()
