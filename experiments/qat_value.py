"""Does QAT earn its keep? (VERDICT r3 #4)

On the flagship EPS(4,4) digits model, post-training int8 quantization is
FREE (test_acc identical to f32, agreement 1.0 — real_digits_results.json),
which left `--qat int8` unproven. This experiment hunts the regime where
PTQ costs accuracy — the DEEP three-EPS config, whose three cascaded W8A8
layers compound per-layer rounding error through products — and measures
whether training WITH the quantizers in the loop (the same
forward_fast_q8train the runner's --qat int8 runs) recovers it, on sklearn's
real 8×8 digits.

Protocol (same data/splits as real_digits_demo, same batch schedule):
  1. train f32 (fast cmt Pallas pipeline), evaluate f32 AND W8A8-PTQ
  2. train with qat="int8" (STE), evaluate the quantized forward
Rows: {f32_acc, ptq_acc, qat_acc} + deltas → qat_value_results.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/qat_value.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

# the learnable three-layer family at 8x8 (the exact 28x28 deep config
# cannot learn from 1,200 digits — measured in
# real_digits_reference_oracle.py; a chance-accuracy PTQ/QAT comparison
# would be meaningless). Overridable for config hunts.
SPECS = tuple(
    tuple(map(int, p.split(",")))
    for p in os.environ.get("DCTN_TPU_QAT_SPECS", "2,4 2,6 2,12").split()
)
ITERS = int(os.environ.get("DCTN_TPU_QAT_ITERS", "600"))
BS = 32
LR = 1e-3

# Activation-range STRESS (VERDICT r4 #6): scale the two φ components by
# s and 1/s. Layer-0 features are Khatri-Rao products of n = K² factors, so
# the within-pixel-column dynamic range grows as spread^(2n) — f32 carries
# it in the exponent, but the per-pixel int8 quantizer (256 levels across
# the column's max) crushes the small-magnitude features to zero. This is
# the regime where PTQ should genuinely lose accuracy and training against
# the quantizer (QAT) can re-balance the weights. 1.0 = no stress.
SPREAD = float(os.environ.get("DCTN_TPU_QAT_SPREAD", "1.0"))


def _apply_spread(x):
    if SPREAD == 1.0:
        return x
    x = np.asarray(x).copy()
    x[..., 0] *= SPREAD
    x[..., 1] /= SPREAD
    return x


def _setup():
    from real_digits_demo import load_splits

    (x_tr, y_tr), (x_va, y_va), (x_te, y_te), _ = load_splits()
    x_tr, x_te = _apply_spread(x_tr), _apply_spread(x_te)
    backend = "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"
    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.models.eps_plus_linear import fast_params_from_reference

    cfg = EPSesPlusLinearConfig(
        epses_specs=SPECS, image_size=8, q0=2,
        train_backend=backend, eval_backend=backend,
    )
    params = init_eps_plus_linear(
        jax.random.PRNGKey(0), cfg, "unit_empirical_output_std",
        init_input=jnp.asarray(x_tr), init_batch_size=256,
    )
    fast, plans = fast_params_from_reference(params, cfg)
    return cfg, fast, plans, (x_tr, y_tr), (x_te, y_te)


def _train(cfg, fast, plans, train_data, qat):
    from dctn_tpu.train import make_optimizer
    from dctn_tpu.train.step import make_fast_train_step

    x_tr, y_tr = train_data
    opt = make_optimizer("adam", LR)
    opt_state = opt.init(fast)
    step = make_fast_train_step(
        cfg, opt, plans, "epswise", 0.0, donate=False, qat=qat
    )
    xd, yd = jnp.asarray(x_tr), jnp.asarray(y_tr)
    rng = np.random.RandomState(1)
    n = y_tr.shape[0]
    perm, off = rng.permutation(n), 0
    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        if off + BS > n:
            perm, off = rng.permutation(n), 0
        idx = jnp.asarray(perm[off : off + BS])
        off += BS
        key, sub = jax.random.split(key)
        fast, opt_state, m = step(
            fast, opt_state, sub, jnp.take(xd, idx, axis=1), jnp.take(yd, idx)
        )
    return fast, time.perf_counter() - t0, float(m["loss"])


def _acc_f32(cfg, fast, plans, x, y):
    from dctn_tpu.models.eps_plus_linear import eps_plus_linear_forward_fast

    logits = eps_plus_linear_forward_fast(fast, jnp.asarray(x), cfg, plans)
    return float(np.mean(np.asarray(jnp.argmax(logits, 1)) == y))


def _acc_int8(cfg, fast, plans, x, y):
    """The W8A8 serving forward (what an int8 artifact ships)."""
    from dctn_tpu.pallas.eps_pallas_q8 import (
        forward_fast_q8,
        quantize_fast_params,
    )

    qp = quantize_fast_params(fast, plans)
    logits = forward_fast_q8(
        qp, jnp.asarray(x), cfg, plans,
        interpret=cfg.eval_backend == "pallas_interpret",
    )
    return float(np.mean(np.asarray(jnp.argmax(logits, 1)) == y))


def main() -> None:
    cfg, fast0, plans, train_data, (x_te, y_te) = _setup()

    fast_f32, secs_f32, loss_f32 = _train(cfg, fast0, plans, train_data, None)
    f32_acc = _acc_f32(cfg, fast_f32, plans, x_te, y_te)
    ptq_acc = _acc_int8(cfg, fast_f32, plans, x_te, y_te)

    fast_qat, secs_qat, loss_qat = _train(
        cfg, fast0, plans, train_data, "int8"
    )
    qat_acc = _acc_int8(cfg, fast_qat, plans, x_te, y_te)
    qat_f32_acc = _acc_f32(cfg, fast_qat, plans, x_te, y_te)

    row = {
        "config": f"EPS {list(map(list, SPECS))} on sklearn digits",
        "phi_component_spread": SPREAD,
        "iters": ITERS,
        "batch_size": BS,
        "f32_test_acc": f32_acc,
        "ptq_int8_test_acc": ptq_acc,
        "ptq_drop_vs_f32": round(f32_acc - ptq_acc, 5),
        "qat_int8_test_acc": qat_acc,
        "qat_recovery_vs_ptq": round(qat_acc - ptq_acc, 5),
        "qat_masters_f32_test_acc": qat_f32_acc,
        "train_seconds_f32": round(secs_f32, 1),
        "train_seconds_qat": round(secs_qat, 1),
        "final_loss_f32": loss_f32,
        "final_loss_qat": loss_qat,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(row, indent=1), flush=True)
    out = os.path.join(os.path.dirname(__file__), "qat_value_results.json")
    existing = json.load(open(out)) if os.path.exists(out) else []
    with open(out, "w") as f:
        json.dump(existing + [row], f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
