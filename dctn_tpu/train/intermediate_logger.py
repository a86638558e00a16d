"""General intermediate-outputs logger — named transforms + histograms of
per-module activations on a schedule.

Capability parity: reference ``dctn/base_intermediate_outputs_logger.py:20-94``
(the full transform set and scalar/histogram record types) and its ignite glue
(``ignite_intermediate_outputs_logger.py``).

TPU-first redesign: the reference attaches mutable forward hooks to
``nn.Module``s and toggles them around the forward it wants to observe. Here
models are pure functions, so each model instead exposes a *named
intermediates* function ``(params, x) → {module_name: array}`` (one jitted
forward that returns every layer's output — XLA dedupes it against the step's
forward when shapes match), and the logger is a pure consumer: apply each
named transform, write a scalar or a histogram through
:class:`~dctn_tpu.train.tb_logging.MetricsWriter`. Scheduling is the caller's
hook cadence — no enable/disable state, no handles to remove.
"""

from __future__ import annotations

import enum
from typing import Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tb_logging import MetricsWriter


class RecordType(enum.Enum):
    SCALAR = enum.auto()
    HISTOGRAM = enum.auto()


# (name, record type, transform) — same triple protocol as the reference.
# Transforms run HOST-SIDE on the one fetched copy of each activation (numpy,
# not jnp — a jnp transform would re-upload the array over the slow relay).
LoggerTransform = Tuple[str, RecordType, Callable[[np.ndarray], np.ndarray]]


def _np_softmax_rows(x: np.ndarray) -> np.ndarray:
    shifted = np.exp(x - x.max(axis=1, keepdims=True))
    return shifted / shifted.sum(axis=1, keepdims=True)


log_dumb_mean_of_abs: LoggerTransform = (
    "dumb_mean_of_abs", RecordType.SCALAR, lambda x: np.mean(np.abs(x)))
log_dumb_max_of_abs: LoggerTransform = (
    "dumb_max_of_abs", RecordType.SCALAR, lambda x: np.max(np.abs(x)))
log_dumb_min_of_abs: LoggerTransform = (
    "dumb_min_of_abs", RecordType.SCALAR, lambda x: np.min(np.abs(x)))
log_dumb_max: LoggerTransform = ("dumb_max", RecordType.SCALAR, np.max)
log_dumb_mean: LoggerTransform = ("dumb_mean", RecordType.SCALAR, np.mean)
log_dumb_min: LoggerTransform = ("dumb_min", RecordType.SCALAR, np.min)
log_dumb_std: LoggerTransform = ("dumb_std", RecordType.SCALAR, np.std)
log_dumb_histogram: LoggerTransform = ("dumb", RecordType.HISTOGRAM, lambda x: x)
log_logits_as_probabilities: LoggerTransform = (
    "logits_as_probabilities",
    RecordType.HISTOGRAM,
    _np_softmax_rows,
)

DEFAULT_TRANSFORMS: Tuple[LoggerTransform, ...] = (
    log_dumb_mean,
    log_dumb_std,
    log_dumb_mean_of_abs,
    log_dumb_max_of_abs,
    log_dumb_histogram,
)


def log_named_outputs(
    writer: MetricsWriter,
    named_outputs: Mapping[str, jax.Array],
    step: int,
    transforms: Sequence[LoggerTransform] = DEFAULT_TRANSFORMS,
    tag_prefix: str = "intermediate",
    module_filter: Optional[Callable[[str], bool]] = None,
) -> None:
    """Write every (transform × module) record. Tag layout matches the
    reference: ``{tag_prefix}_{transform_name}/{module_name}``
    (base_intermediate_outputs_logger.py:68-80). One device→host fetch per
    module (the raw array), transforms applied host-side on the fetched copy —
    the fetch dominates on this relay, so don't fetch once per transform."""
    for module_name, arr in named_outputs.items():
        if module_filter is not None and not module_filter(module_name):
            continue
        host = np.asarray(arr)
        for name, record_type, transform in transforms:
            tag = f"{tag_prefix}_{name}/{module_name}"
            value = np.asarray(transform(host))
            if record_type is RecordType.SCALAR:
                writer.add_scalar(tag, float(value), step)
            else:
                writer.add_histogram(tag, value, step)


# ---------------------------------------------------------------------------
# named-intermediates functions for the two model families


def eps_plus_linear_named_outputs(params, x, cfg) -> Dict[str, jax.Array]:
    """{eps_0, …, eps_{n-1}, linear} — each EPS layer's output and the logits
    (the functional analog of named_modules over EPSesPlusLinear)."""
    from ..ops import eps as eps_mod

    named: Dict[str, jax.Array] = {}
    intermediate = x
    for i, core in enumerate(params["epses"]):
        out = eps_mod.eps(core, intermediate, compute_dtype=cfg.compute_dtype)
        named[f"eps_{i}"] = out
        intermediate = out[None]
    h = intermediate[0]
    flat = h.reshape(h.shape[0], -1)
    named["linear"] = flat @ params["linear"]["w"] + params["linear"]["b"]
    return named


def conv_sbs_model_named_outputs(params, cfg, images) -> Dict[str, jax.Array]:
    """{layer{i}.string{j}, logits} for the legacy ConvSBS stack
    (mnist.py:255-263 forward, observed per string like the reference's
    per-module hooks)."""
    from ..models.conv_sbs_model import _forward_layers, batch_to_quantum

    quantum = batch_to_quantum(images, cfg.cos_sin_squared, cfg.input_multiplier)
    named: Dict[str, jax.Array] = {}
    outs = None
    for i, outs in enumerate(_forward_layers(params, cfg, quantum)):
        for j, out in enumerate(outs):
            named[f"layer{i}.string{j}"] = out
    (result,) = outs
    named["logits"] = jnp.mean(result, axis=(1, 2))
    return named


# ---------------------------------------------------------------------------
# parameter / gradient histograms (mnist.py:535-536 WeightsHistHandler /
# GradsHistHandler equivalents)


def _leaf_name(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def log_tree_histograms(
    writer: MetricsWriter, tree, step: int, tag_prefix: str
) -> None:
    """One histogram + μ/σ scalars per leaf of a parameter or gradient
    pytree."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = _leaf_name(path)
        host = np.asarray(leaf)
        writer.add_histogram(f"{tag_prefix}/{name}", host, step)
        writer.add_scalar(f"{tag_prefix}_mean/{name}", float(host.mean()), step)
        writer.add_scalar(f"{tag_prefix}_std/{name}", float(host.std()), step)
