"""Real-data end-to-end training on sklearn's built-in digits dataset.

Accuracy parity against the reference's recorded FashionMNIST/CIFAR numbers
is data-blocked here (zero egress, no dataset files on disk), but
scikit-learn ships 1,797 REAL 8×8 grayscale digit images inside the
package — enough to demonstrate the full stack on real images end to end:
φ quantum feature map → float64 ν window scaling → empirical unit-output-std
initialization → EPS(4,4)+linear training (Adam, epswise L2) → evaluation —
the reference's 90.19%-vacc architecture family at 8×8 scale.

Methodology mirrors the reference recipe (dataset_loading.py's φ/ν +
the single-EPS training family of replicate_90.19_vacc_experiment.py) at 8×8
scale. Appends {val_acc, test_acc, ...} to real_digits_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sklearn.datasets import load_digits

from dctn_tpu.data.feature_maps import apply_feature_map
from dctn_tpu.data.pipeline import calc_scaling_factor
from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.train import make_optimizer, make_train_step
from dctn_tpu.train.evaluation import make_score_fn


def load_splits(seed: int = 0):
    """digits → φ/ν quantum splits (1200 train / 300 val / 297 test)."""
    digits = load_digits()
    images = (digits.images / 16.0).astype(np.float64)  # (1797, 8, 8) ∈ [0,1]
    labels = digits.target.astype(np.int32)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(labels))
    images, labels = images[order], labels[order]

    x_all = apply_feature_map(images)  # (1, N, 8, 8, 2)
    nu = calc_scaling_factor(x_all[:, :1200], kernel_size=4)
    x_all = (x_all.astype(np.float64) * nu).astype(np.float32)
    tr, va = slice(0, 1200), slice(1200, 1500)
    te = slice(1500, len(labels))
    return (
        (x_all[:, tr], labels[tr]),
        (x_all[:, va], labels[va]),
        (x_all[:, te], labels[te]),
        nu,
    )


def load_raw_splits(seed: int = 0):
    """Raw [0,1] images for the legacy model (it applies φ internally)."""
    digits = load_digits()
    images = (digits.images / 16.0).astype(np.float32)
    labels = digits.target.astype(np.int32)
    order = np.random.RandomState(seed).permutation(len(labels))
    images, labels = images[order], labels[order]
    return (
        (images[:1200], labels[:1200]),
        (images[1200:1500], labels[1200:1500]),
        (images[1500:], labels[1500:]),
    )


def train_legacy() -> dict:
    """The legacy ConvSBS (string-bond) model family on the same real
    images — mnist.py:169-284's architecture, fused Pallas TT-fold kernels
    on TPU. Off by default (set DIGITS_LEGACY=1); this quick-demo config
    (400 iters, khrulkov init) stays near chance — the family NEEDS the
    reference's own recipe at this scale: min_random_eye init + layer
    rescaling + Adam and ~24k iterations reach val 0.947 / test 0.929
    (and the torch reference agrees to delta 0.007 —
    legacy_digits_recipe_search.py found the recipe,
    legacy_digits_oracle_learn.py is the two-stack proof)."""
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        conv_sbs_model_forward,
        calc_std_of_coordinates_of_windows,
        scale_layers_using_batch,
    )

    (x_tr, y_tr), (x_va, y_va), (x_te, y_te) = load_raw_splits()
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    # the legacy recipe (mnist.py:434-463): window-std input multiplier,
    # then layer-by-layer output-std rescaling on a batch — without these the
    # snake strings' outputs collapse/explode and training flatlines at ln 10
    std = float(
        calc_std_of_coordinates_of_windows(jnp.asarray(x_tr), 3, False, 1.0)
    )
    multiplier = std ** (-1.0 / 9.0)
    cfg = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=2, backend=backend,
        input_multiplier=multiplier,
    )
    params = init_conv_sbs_model(jax.random.PRNGKey(0), cfg)
    params = scale_layers_using_batch(params, cfg, jnp.asarray(x_tr[:512]))
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, xb, yb):
        def loss_fn(pp):
            logits = conv_sbs_model_forward(pp, cfg, xb)
            lp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(lp, yb[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(grads, o, p)
        import optax

        return optax.apply_updates(p, up), o, loss

    @jax.jit
    def accuracy(p, xb, yb):
        pred = jnp.argmax(conv_sbs_model_forward(p, cfg, xb), axis=1)
        return jnp.mean((pred == yb).astype(jnp.float32))

    x_tr_d, y_tr_d = jnp.asarray(x_tr), jnp.asarray(y_tr)
    rng = np.random.RandomState(1)
    bs, iters = 128, 3000
    n = y_tr.shape[0]
    perm, off = rng.permutation(n), 0
    best_val = 0.0
    t0 = time.perf_counter()
    for it in range(1, iters + 1):
        if off + bs > n:
            perm, off = rng.permutation(n), 0
        idx = jnp.asarray(perm[off : off + bs])
        off += bs
        params, opt_state, l = step(
            params, opt_state,
            jnp.take(x_tr_d, idx, axis=0), jnp.take(y_tr_d, idx, axis=0),
        )
        if it % 500 == 0:
            va = float(accuracy(params, jnp.asarray(x_va), jnp.asarray(y_va)))
            best_val = max(best_val, va)
            print(f"legacy iter {it}: loss {float(l):.4f} val_acc {va:.4f}", flush=True)
    ta = float(accuracy(params, jnp.asarray(x_te), jnp.asarray(y_te)))
    return {
        "kind": "real-data digits, legacy ConvSBS model (2 layers, bond 2)",
        "backend": backend,
        "iters": iters,
        "val_acc_best": best_val,
        "test_acc": ta,
        "train_seconds": round(time.perf_counter() - t0, 1),
        "device": str(jax.devices()[0]),
    }


def main() -> None:
    (x_tr, y_tr), (x_va, y_va), (x_te, y_te), nu = load_splits()
    cfg = EPSesPlusLinearConfig(
        epses_specs=((4, 4),), image_size=8, q0=2,
    )
    params = init_eps_plus_linear(
        jax.random.PRNGKey(0), cfg, "unit_empirical_output_std",
        init_input=jnp.asarray(x_tr),
    )
    opt = make_optimizer("adam", 3e-4)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epswise", 1e-4, donate=False)
    score = make_score_fn(cfg, batch_size=128)

    x_tr_d, y_tr_d = jnp.asarray(x_tr), jnp.asarray(y_tr)
    rng = np.random.RandomState(1)
    key = jax.random.PRNGKey(2)
    bs, iters = 128, 1200
    n = y_tr.shape[0]
    best_val = 0.0
    t0 = time.perf_counter()
    perm, off = rng.permutation(n), 0
    for it in range(1, iters + 1):
        if off + bs > n:
            perm, off = rng.permutation(n), 0
        idx = jnp.asarray(perm[off : off + bs])
        off += bs
        xb = jnp.take(x_tr_d, idx, axis=1)
        yb = jnp.take(y_tr_d, idx, axis=0)
        key, sub = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, sub, xb, yb)
        if it % 100 == 0:
            vm, va = score(params, jnp.asarray(x_va), jnp.asarray(y_va))
            best_val = max(best_val, float(va))
            print(
                f"iter {it}: loss {float(m['loss']):.4f} "
                f"val_ce {float(vm):.4f} val_acc {float(va):.4f}",
                flush=True,
            )
    tm, ta = score(params, jnp.asarray(x_te), jnp.asarray(y_te))

    # int8 W8A8 serving accuracy on the TRAINED model — the number an
    # `export --quantize int8` artifact of this checkpoint ships with
    # (pallas/eps_pallas_q8.py; fused kernels on TPU, interpret on CPU).
    import dataclasses

    from dctn_tpu.cli.predict import _resolve_forward, predict_split

    q_backend = (
        "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"
    )
    q_cfg = dataclasses.replace(cfg, eval_backend=q_backend)
    fq, fwd_q8 = _resolve_forward(params, q_cfg, quantize="int8")
    ff, fwd_f32 = _resolve_forward(params, q_cfg)
    x_te_d = jnp.asarray(x_te)
    preds_q8 = predict_split(fq, q_cfg, x_te_d, 128, forward_fn=fwd_q8)
    preds_f32 = predict_split(ff, q_cfg, x_te_d, 128, forward_fn=fwd_f32)
    int8_acc = float(np.mean(preds_q8 == y_te))
    agreement = float(np.mean(preds_q8 == preds_f32))
    print(
        f"int8 serving: test_acc {int8_acc:.4f} "
        f"(f32 {float(ta):.4f}), pred agreement {agreement:.4f}",
        flush=True,
    )
    result = {
        "kind": "real-data digits (sklearn built-in), EPS(4,4)+linear (the 90.19-family architecture)",
        "nu": nu,
        "iters": iters,
        "val_acc_best": best_val,
        "test_acc": float(ta),
        "test_mean_ce": float(tm),
        "test_acc_int8_serving": int8_acc,
        "int8_pred_agreement_vs_f32": agreement,
        "train_seconds": round(time.perf_counter() - t0, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result), flush=True)
    results = [result]
    if os.environ.get("DIGITS_LEGACY"):
        legacy_result = train_legacy()
        print(json.dumps(legacy_result), flush=True)
        results.append(legacy_result)
    out = os.path.join(os.path.dirname(__file__), "real_digits_results.json")
    existing = json.load(open(out)) if os.path.exists(out) else []
    with open(out, "w") as f:
        json.dump(existing + results, f, indent=1)


if __name__ == "__main__":
    main()
