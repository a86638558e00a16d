"""Find a training recipe that makes the legacy ConvSBS snake-string model
LEARN on sklearn's real 8x8 digits (VERDICT r4 next-round #1).

The r4 oracle row "agreed" with the torch reference at 0.148 test accuracy —
chance on 10 classes — which proves trajectory parity but not that the
family can train end-to-end. The reference demonstrably trained MNIST with
this model (mnist.py:169-284 + its recipe: min-random-eye initialization,
window-std input scaling, data-dependent layer rescaling, exponential LR
warmup, SGD/RMSprop — mnist.py:117-159,265-284,489-499). This script sweeps
that recipe's knobs ON OUR STACK ONLY (fast 8x8 iterations) to find a
configuration with test accuracy well above chance; the winner is then
reproduced in BOTH stacks by experiments/real_digits_reference_oracle.py.

Run: python experiments/legacy_digits_recipe_search.py
Writes experiments/legacy_digits_recipe_search_results.json.
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    import jax

    if jax.default_backend() != "cpu":  # tiny 8x8 model: CPU beats the relay
        pass  # (backend already initialized; keep whatever we got)
    import jax.numpy as jnp
    import optax

    from real_digits_demo import load_raw_splits
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        conv_sbs_model_forward,
        calc_std_of_coordinates_of_windows,
        scale_layers_using_batch,
        make_legacy_optimizer,
        make_warmup_lr_schedule,
    )
    from dctn_tpu.ops import sbs

    (x_tr, y_tr), (x_va, y_va), (x_te, y_te) = load_raw_splits()
    xd, yd = jnp.asarray(x_tr), jnp.asarray(y_tr)
    xv, xt = jnp.asarray(x_va), jnp.asarray(x_te)

    def run(cfg_kw, init_name, base_std, opt_name, lr, momentum,
            warmup_epochs, epochs, bs, rescale, seed=0):
        cfg = ConvSBSModelConfig(**cfg_kw)
        std = float(
            calc_std_of_coordinates_of_windows(
                xd, 3, cfg.cos_sin_squared, 1.0
            )
        )
        cfg = ConvSBSModelConfig(
            **{**cfg_kw, "input_multiplier": std ** (-1.0 / 9.0)}
        )
        if init_name == "min_random_eye":
            init_fn, init_kw = sbs.init_min_random_eye, {"base_std": base_std}
        elif init_name == "khrulkov":
            init_fn, init_kw = sbs.init_khrulkov_normal, {}
        else:
            init_fn, init_kw = sbs.init_dumb_normal, {"std": base_std}
        params = init_conv_sbs_model(
            jax.random.PRNGKey(seed), cfg, init_fn, **init_kw
        )
        if rescale:
            params = scale_layers_using_batch(params, cfg, xd[:512])

        steps_per_epoch = y_tr.shape[0] // bs
        if opt_name == "adam":
            opt = optax.adam(lr)
        else:
            sched = make_warmup_lr_schedule(lr, warmup_epochs, steps_per_epoch)
            opt = make_legacy_optimizer(opt_name, sched, momentum=momentum)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, o, xb, yb):
            def loss_fn(pp):
                logits = conv_sbs_model_forward(pp, cfg, xb)
                lp = jax.nn.log_softmax(logits, axis=-1)
                return -jnp.mean(jnp.take_along_axis(lp, yb[:, None], axis=1))

            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, o = opt.update(grads, o, p)
            return optax.apply_updates(p, up), o, loss

        @jax.jit
        def acc_of(p, x, y):
            return jnp.mean(
                jnp.argmax(conv_sbs_model_forward(p, cfg, x), axis=1) == y
            )

        rng = np.random.RandomState(1)
        best_val, best_test, best_epoch = 0.0, 0.0, -1
        train_acc = 0.0
        t0 = time.perf_counter()
        last_loss = float("nan")
        for epoch in range(epochs):
            perm = rng.permutation(y_tr.shape[0])
            for s in range(steps_per_epoch):
                i = jnp.asarray(perm[s * bs : (s + 1) * bs])
                params, opt_state, loss = step(
                    params, opt_state, jnp.take(xd, i, axis=0), jnp.take(yd, i)
                )
            last_loss = float(loss)
            if not np.isfinite(last_loss):
                break
            if (epoch + 1) % max(5, epochs // 40) == 0 or epoch == epochs - 1:
                va = float(acc_of(params, xv, jnp.asarray(y_va)))
                if va > best_val:
                    best_val = va
                    best_test = float(acc_of(params, xt, jnp.asarray(y_te)))
                    best_epoch = epoch
                    train_acc = float(acc_of(params, xd[:600], yd[:600]))
        return {
            "train_acc_at_best_val": round(train_acc, 4),
            "init": init_name, "base_std": base_std, "opt": opt_name,
            "lr": lr, "momentum": momentum, "warmup_epochs": warmup_epochs,
            "epochs": epochs, "bs": bs, "rescale": rescale,
            "cos_sin_squared": cfg.cos_sin_squared,
            "bond": cfg.bond_dim_size,
            "best_val_acc": round(best_val, 4),
            "test_acc_at_best_val": round(best_test, 4),
            "best_epoch": best_epoch, "final_loss": last_loss,
            "seconds": round(time.perf_counter() - t0, 1),
        }

    rows = []
    base = dict(num_sbs_layers=2, bond_dim_size=2, cos_sin_squared=True)
    # round-1 findings (legacy_digits_recipe_search_results.json history):
    # EVERY 120-epoch config sat at chance with loss pinned at ln(10) —
    # rmsprop/sgd at the reference's lr 1e-2 collapse the multiplicative
    # output scale immediately (gradients through a dead product chain are
    # ~0, so it never recovers), while Adam lr 1e-3 was slowly learning
    # (loss 2.248 and falling). The reference's own MNIST recipe ran
    # ~3M steps; 1,440 steps was just far too short. Round 2: thousands of
    # epochs (12 steps each — still minutes at 8x8), Adam, and lower
    # post-warmup RMSprop lrs.
    grid = [
        (base, "min_random_eye", 0.1, "adam", 1e-3, 0.0, 0, 2000, 100, True),
        (base, "min_random_eye", 0.1, "adam", 3e-3, 0.0, 0, 2000, 100, True),
        (base, "min_random_eye", 0.1, "rmsprop", 1e-3, 0.0, 40, 2000, 100, True),
        (base, "min_random_eye", 0.1, "rmsprop", 3e-4, 0.0, 40, 2000, 100, True),
        (dict(base, bond_dim_size=4), "min_random_eye", 0.1, "adam",
         1e-3, 0.0, 0, 2000, 100, True),
        (base, "khrulkov", None, "adam", 1e-3, 0.0, 0, 2000, 100, True),
    ]
    for args in grid:
        row = run(*args)
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: -r["best_val_acc"])
    out = {"device": str(jax.devices()[0]), "rows": rows}
    path = os.path.join(
        os.path.dirname(__file__), "legacy_digits_recipe_search_results.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}; best: {json.dumps(rows[0])}")


if __name__ == "__main__":
    main()
