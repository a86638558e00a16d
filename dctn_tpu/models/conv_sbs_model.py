"""The legacy ConvSBS MNIST model family (reference ``mnist.py:169-284``),
functional-style.

Architecture: a stack of ManyConvSBS layers over 3×3 patches. The first
``num_sbs_layers - 1`` layers each run TWO strings whose cores visit the grid
in two different snake orders (the middle core carries out-dim 2); their two
outputs become the 2 input channels of the next layer. The final layer is ONE
string whose middle core emits ``num_labels``; logits are the mean over the
remaining spatial positions.

Also provides the legacy quantum map (sin/cos or sin²/cos², times a
multiplier — no factor 2, mnist.py:132-141), the window-std input scaling
statistic (mnist.py:144-166), data-dependent layer rescaling
(``scale_layers_using_batch``, mnist.py:265-284), and the LR warmup schedule
(mnist.py:489-499).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import sbs
from ..ops.windows import make_windows
from ..utils.pos2d import Pos2D

logger = logging.getLogger(__name__)

NUM_LABELS = 10

# The two snake orders of the reference's 3×3 strings (mnist.py:190-216);
# position of each core in grid coordinates, middle core carries the out dim.
SNAKE_ROW_MAJOR = (
    Pos2D(0, 0), Pos2D(0, 1), Pos2D(0, 2), Pos2D(1, 2), Pos2D(1, 1),
    Pos2D(1, 0), Pos2D(2, 0), Pos2D(2, 1), Pos2D(2, 2),
)
SNAKE_COL_MAJOR = (
    Pos2D(0, 0), Pos2D(1, 0), Pos2D(2, 0), Pos2D(2, 1), Pos2D(1, 1),
    Pos2D(0, 1), Pos2D(0, 2), Pos2D(1, 2), Pos2D(2, 2),
)


def snake_cores_spec(
    positions: Sequence[Pos2D], middle_out: int
) -> Tuple[sbs.SBSSpecCore, ...]:
    return tuple(
        sbs.SBSSpecCore(p, middle_out if p == Pos2D(1, 1) else 1) for p in positions
    )


@dataclasses.dataclass(frozen=True)
class ConvSBSModelConfig:
    num_sbs_layers: int
    bond_dim_size: int
    trace_edge: bool = False
    cos_sin_squared: bool = False
    input_multiplier: float = 1.0
    num_labels: int = NUM_LABELS
    backend: str = "xla"  # "pallas": fused TT-fold kernels (sbs_pallas.py),
    # open strings and trace_edge rings alike
    # per-layer fused-kernel tuning picks from the SBS autotuner (r5):
    # tuple over layers of (bn, mcut, dcore_dot[, mim]) or None (heuristic
    # picks); shorter tuples leave the remaining layers on heuristics; the
    # optional 4th element forces the kernel family (False = sequential)
    kernel_tuning: tuple = ()

    def __post_init__(self):
        assert self.num_sbs_layers >= 2

    def layer_specs(self) -> Tuple[Tuple[sbs.SBSSpecString, ...], ...]:
        two_string = (
            snake_cores_spec(SNAKE_ROW_MAJOR, 2),
            snake_cores_spec(SNAKE_COL_MAJOR, 2),
        )
        final = (snake_cores_spec(SNAKE_ROW_MAJOR, self.num_labels),)
        layers = []
        for i in range(self.num_sbs_layers):
            in_channels = 1 if i == 0 else 2
            cores_specs = final if i == self.num_sbs_layers - 1 else two_string
            layers.append(
                sbs.make_many_specs(
                    in_channels, 2, self.bond_dim_size, self.trace_edge, cores_specs
                )
            )
        return tuple(layers)


# params: tuple over layers of tuple over strings of tuple of core arrays
ConvSBSModelParams = Tuple[Tuple[sbs.SBSCores, ...], ...]


def init_conv_sbs_model(
    key: jax.Array,
    cfg: ConvSBSModelConfig,
    init_fn: Callable[..., sbs.SBSCores] = sbs.init_khrulkov_normal,
    dtype=jnp.float32,
    **init_kwargs,
) -> ConvSBSModelParams:
    layers = []
    for li, layer_spec in enumerate(cfg.layer_specs()):
        strings = []
        for si, string_spec in enumerate(layer_spec):
            k = jax.random.fold_in(jax.random.fold_in(key, li), si)
            strings.append(init_fn(k, string_spec, dtype=dtype, **init_kwargs))
        layers.append(tuple(strings))
    return tuple(layers)


def batch_to_quantum(
    x: jax.Array, cos_sin_squared: bool, multiplier: float
) -> jax.Array:
    """(B, H, W) pixel batch → (1, B, H, W, 2) quantum features
    (mnist.py:132-141; sin/cos WITHOUT squaring unless cos_sin_squared)."""
    if cos_sin_squared:
        q = jnp.stack((jnp.sin(x) ** 2, jnp.cos(x) ** 2), axis=-1)
    else:
        q = jnp.stack((jnp.sin(x), jnp.cos(x)), axis=-1)
    return (q * multiplier)[None]


def calc_std_of_coordinates_of_windows(
    x: jax.Array, kernel_size: int, cos_sin_squared: bool, multiplier: float = 1.0
) -> jax.Array:
    """std over the window rank-one-tensor batch of a quantumized pixel batch
    (mnist.py:144-166) — used to choose the input multiplier."""
    q = batch_to_quantum(x, cos_sin_squared, multiplier)
    return make_windows(q, kernel_size).std_over_batch()


def _forward_layers(
    params: ConvSBSModelParams, cfg: ConvSBSModelConfig, quantum: jax.Array
):
    """Yield each layer's tuple-of-strings output. Between layers the string
    outputs are stacked as channels (ManyConvSBS chaining, mnist.py:255-263)."""
    specs = cfg.layer_specs()
    intermediate = quantum  # (C, B, H, W, Q)
    for layer_spec, layer_params in zip(specs, params):
        outs = sbs.many_conv_sbs(layer_spec, layer_params, intermediate)
        yield outs
        intermediate = jnp.stack(outs, axis=0)


def _pallas_model_forward(
    params: ConvSBSModelParams, cfg: ConvSBSModelConfig, x: jax.Array
):
    """Fully-transposed fused pipeline: quantum map straight into the
    batch-minor (C, Q, H, W, B), every string through the fused TT-fold
    kernel, string outputs stacked as the next layer's channels with zero
    relayouts, final spatial mean on the (10, H', W', B) logits map. Returns
    None when any layer's spec isn't kernel-supported (ring strings etc.)."""
    from ..pallas.sbs_pallas import conv_sbs_pallas_t, sbs_pallas_profitable

    if x.dtype != jnp.float32 or any(
        c.dtype != jnp.float32 for layer in params for cores in layer for c in cores
    ):
        return None  # kernels declare f32 blocks; f64 params take the XLA path
    interpret = cfg.backend == "pallas_interpret"
    specs = cfg.layer_specs()
    for layer_spec in specs:
        if not all(sbs_pallas_profitable(s) for s in layer_spec):
            return None
    xb = jnp.transpose(x, (1, 2, 0))  # (H, W, B): batch onto lanes
    if cfg.cos_sin_squared:
        q = jnp.stack((jnp.sin(xb) ** 2, jnp.cos(xb) ** 2), axis=0)
    else:
        q = jnp.stack((jnp.sin(xb), jnp.cos(xb)), axis=0)
    xT = (q * cfg.input_multiplier)[None]  # (1, 2, H, W, B)
    outT = None
    for li, (layer_spec, layer_params) in enumerate(zip(specs, params)):
        tune = (
            cfg.kernel_tuning[li]
            if li < len(cfg.kernel_tuning) and cfg.kernel_tuning[li]
            else (None, None, None)
        )
        outsT = [
            conv_sbs_pallas_t(
                s, cores, xT, interpret,
                mim=(tune[3] if len(tune) > 3 else None),
                bn=tune[0], mcut=tune[1], dcore_dot=tune[2],
                # layer 0's input cotangent is statically dead: its d_x
                # flows into the quantum map, which has no trained
                # parameters — skip the d_v sweeps + dviews write
                need_dviews=(li > 0),
            )
            for s, cores in zip(layer_spec, layer_params)
        ]
        outT = outsT[0]
        xT = jnp.stack(outsT, axis=0)  # strings → channels, out_q → quantum
    return jnp.mean(outT, axis=(1, 2)).T  # (10, B) → (B, 10)


def conv_sbs_model_forward(
    params: ConvSBSModelParams, cfg: ConvSBSModelConfig, x: jax.Array
) -> jax.Array:
    """(B, H, W) pixels → (B, num_labels) logits: quantum map, SBS stack,
    mean over spatial dims (mnist.py:255-263)."""
    if cfg.backend in ("pallas", "pallas_interpret"):
        out = _pallas_model_forward(params, cfg, x)
        if out is not None:
            return out
    quantum = batch_to_quantum(x, cfg.cos_sin_squared, cfg.input_multiplier)
    outs = None
    for outs in _forward_layers(params, cfg, quantum):
        pass
    (result,) = outs
    return jnp.mean(result, axis=(1, 2))


def scale_layers_using_batch(
    params: ConvSBSModelParams, cfg: ConvSBSModelConfig, x: jax.Array
) -> ConvSBSModelParams:
    """Data-dependent rescaling (mnist.py:265-284): layer by layer, divide
    each string (as a TN, factor spread across cores) by its output std on the
    batch, then recompute the layer output with the SCALED cores before moving
    on. Returns new params (functional, no mutation)."""
    specs = cfg.layer_specs()
    quantum = batch_to_quantum(x, cfg.cos_sin_squared, cfg.input_multiplier)
    intermediate = quantum
    new_params = []
    for layer_spec, layer_params in zip(specs, params):
        outs = sbs.many_conv_sbs(layer_spec, layer_params, intermediate)
        scaled_strings = []
        for string_spec, cores, out in zip(layer_spec, layer_params, outs):
            # torch .std() applies Bessel's correction — match it exactly
            # (found by the reference-as-oracle test: biased std compounds
            # to ~2.4e-3 core drift over two layers)
            std = float(jnp.std(out, ddof=1))
            if std != 0.0:
                scaled_strings.append(
                    sbs.multiply_by_scalar(string_spec, cores, 1.0 / std)
                )
                logger.info("Divided a ConvSBS by %s", std)
            else:
                scaled_strings.append(cores)
                logger.warning("std == 0.0, not scaling")
        new_layer = tuple(scaled_strings)
        new_params.append(new_layer)
        outs = sbs.many_conv_sbs(layer_spec, new_layer, intermediate)
        intermediate = jnp.stack(outs, axis=0)
    return tuple(new_params)


def make_warmup_lr_schedule(
    base_lr: float,
    warmup_num_epochs: int,
    steps_per_epoch: int = 1,
    warmup_initial_multiplier: float = 1e-20,
):
    """The legacy runner's exponential warmup (mnist.py:489-499): during the
    first W epochs the lr multiplier is m^((W - epoch)/W) with m the initial
    multiplier (so it starts at m·base_lr and decays the exponent linearly to
    m⁰ = 1), constant base_lr afterwards. Step-indexed for optax."""

    def schedule(step):
        # optax passes a CONCRETE int32 count under jit: int32/int division
        # promotes to f32, and the weak-typed m**frac would then compute in
        # f32 — an lr with ~2e-8 relative error, which RMSprop amplifies
        # (the division by sqrt(v) ~ |g| turns lr-scale param error into
        # update-scale error via weight decay). Compute in the default
        # float dtype (f64 under x64) explicitly.
        fdt = jnp.result_type(float)
        epoch = jnp.asarray(step) // max(steps_per_epoch, 1)
        frac = jnp.clip(
            (warmup_num_epochs - epoch).astype(fdt) / max(warmup_num_epochs, 1),
            0.0, 1.0,
        )
        return base_lr * jnp.asarray(warmup_initial_multiplier, fdt) ** frac

    return schedule


def make_legacy_optimizer(
    optimizer_type: str,
    learning_rate,
    momentum: float = 0.0,
    rmsprop_alpha: float = 0.99,
    weight_decay: float = 0.0,
):
    """The legacy runner's optimizer stack with EXACT torch semantics
    (mnist.py:464-478: ``torch.optim.SGD``/``RMSprop`` with momentum and
    weight_decay forwarded to both).

    torch-parity details that matter for trajectory equality
    (tests/test_reference_parity.py legacy trajectory test):

    - RMSprop's eps sits OUTSIDE the square root in torch
      (``g / (sqrt(v) + eps)``) — optax defaults to inside
      (``g / sqrt(v + eps)``), so ``eps_in_sqrt=False``.
    - torch applies the CURRENT lr to the whole momentum buffer
      (``buf = mu*buf + g/avg; p -= lr_t * buf``) — but
      ``optax.rmsprop(momentum=...)`` puts ``trace`` AFTER the lr scaling,
      accumulating ``lr_s``-scaled terms instead. Identical under a
      constant lr, DIVERGENT under the legacy warmup schedule — so the
      rmsprop+momentum chain is composed by hand in torch order
      (scale_by_rms → trace → scale_by_learning_rate). optax.sgd already
      orders trace before the lr and needs no such fix.
    - torch's ``weight_decay`` adds ``wd * p`` to the RAW gradient before
      any moment accumulation — ``optax.add_decayed_weights`` chained
      BEFORE the core transform does the same.
    """
    import optax

    if optimizer_type == "sgd":
        core = optax.sgd(learning_rate, momentum=momentum or None)
    elif optimizer_type == "rmsprop":
        core = optax.chain(
            optax.scale_by_rms(decay=rmsprop_alpha, eps_in_sqrt=False),
            optax.trace(decay=momentum) if momentum else optax.identity(),
            optax.scale_by_learning_rate(learning_rate),
        )
    else:
        raise ValueError(f"unknown optimizer_type: {optimizer_type}")
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), core)
    return core
